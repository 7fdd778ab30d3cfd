"""Quantify the two documented parity divergences (VERDICT r2 item 7).

1. `random_sample` keeps duplicate negative indices where the reference
   dedups them (`base_sampler.py:101 neg_inds.unique()` after
   `random_sampler.py:36-39` draws WITH replacement via
   np.random.randint).  The tests bound the duplicate-slot fraction and
   its effect on a mean-reduced loss at the reference RCNN sampling
   geometry (num=256, ~2000 proposals).

2. `mask_target_single` approximates the reference's per-proposal CPU
   resize (`mask_target.py:41-44`: skimage.transform.resize -> *255 ->
   uint8 -> >0) with an on-device trilinear sample at skimage's
   grid-center coordinates thresholded at 1/255.  The oracle below
   re-implements skimage 0.18.0 `resize` (the reference's pinned
   version, requirements.txt:24) faithfully in scipy: gaussian
   anti-aliasing prefilter with sigma=(factor-1)/2 when downsampling,
   then order-1 `map_coordinates` at (i+0.5)*factor-0.5 with mirror
   boundaries.  The divergences are (a) no anti-aliasing prefilter and
   (b) clamp-vs-mirror at borders; the test asserts the mean voxel
   disagreement stays under 1%.
"""
import jax
import jax.numpy as jnp
import numpy as np
import scipy.ndimage as ndi

from mrcnn3d.core.targets import mask_target_single, random_sample

# ---------------------------------------------------------------------------
# 1. sampler negative-dedup skip
# ---------------------------------------------------------------------------


def _sample_geometry(n_prop=2000, n_pos=8, num=256, pos_fraction=0.25):
    assigned = np.zeros(n_prop, np.int32)
    assigned[:n_pos] = 1  # gt index 1 => positive
    return jnp.asarray(assigned), num, pos_fraction


def test_sampler_duplicate_fraction_bounded():
    """Duplicate negative slots stay a small minority of the batch.

    With q draws (with replacement) from n candidates the expected
    duplicate fraction is ~q/(2n); at the reference geometry
    (q=248 negatives from ~1992 candidates) that is ~6%.  Measured
    empirically over 100 keys and asserted < 10%.
    """
    assigned, num, pf = _sample_geometry()
    frac = []
    sample = jax.jit(
        lambda k: random_sample(k, assigned, num, pf),
        static_argnums=(),
    )
    for seed in range(100):
        res = sample(jax.random.PRNGKey(seed))
        neg = np.asarray(res.neg_inds)[np.asarray(res.neg_mask)]
        frac.append(1.0 - len(np.unique(neg)) / max(len(neg), 1))
    mean_frac = float(np.mean(frac))
    # ~q/(2n) theoretical collision rate; fail loudly if sampling ever
    # degenerates (e.g. constant index) — that would push this to ~1.
    assert 0.0 < mean_frac < 0.10, mean_frac


def test_sampler_dup_vs_dedup_loss_effect():
    """Effect of kept duplicates on a mean-reduced per-sample loss.

    The reference averages the negative loss over the deduped index set;
    we average over the slot set (duplicates double-weighted).  Both are
    unbiased estimates of the pool mean; over 100 keys the mean absolute
    relative difference is ~0.5% and is asserted < 2%.
    """
    assigned, num, pf = _sample_geometry()
    rng = np.random.RandomState(0)
    losses = rng.rand(int(assigned.shape[0])).astype(np.float64)
    rels = []
    for seed in range(100):
        res = random_sample(jax.random.PRNGKey(seed), assigned, num, pf)
        neg = np.asarray(res.neg_inds)[np.asarray(res.neg_mask)]
        ours = losses[neg].mean()
        ref = losses[np.unique(neg)].mean()
        rels.append(abs(ours - ref) / ref)
    assert float(np.mean(rels)) < 0.02, np.mean(rels)


# ---------------------------------------------------------------------------
# 2. mask-target trilinear approximation vs skimage-0.18 oracle
# ---------------------------------------------------------------------------


def _skimage_resize_018(img, out_shape, anti_aliasing):
    """skimage.transform.resize(order=1, mode='reflect') as of 0.18.0."""
    img = img.astype(np.float64)
    factors = np.asarray(img.shape, float) / np.asarray(out_shape, float)
    if anti_aliasing and np.any(factors > 1):
        sigma = np.maximum(0.0, (factors - 1) / 2)
        img = ndi.gaussian_filter(img, sigma, mode="mirror")
    coords = np.meshgrid(
        *[
            f * (np.arange(int(d)) + 0.5) - 0.5
            for f, d in zip(factors, out_shape)
        ],
        indexing="ij",
    )
    return ndi.map_coordinates(img, coords, order=1, mode="mirror")


def _ref_mask_target(gt_mask, bbox, ms, msd, anti_aliasing):
    x1, y1, x2, y2, z1, z2 = bbox
    w = max(x2 - x1 + 1, 1)
    h = max(y2 - y1 + 1, 1)
    d = max(z2 - z1 + 1, 1)
    crop = gt_mask[z1 : z1 + d, y1 : y1 + h, x1 : x1 + w]
    t = 255 * _skimage_resize_018(crop, (msd, ms, ms), anti_aliasing)
    return (t.astype(np.uint8) > 0).astype(np.float32)


def _blob_mask(rng, d, h, w):
    m = np.zeros((d, h, w), np.uint8)
    for _ in range(3):
        cz, cy, cx = rng.randint(0, d), rng.randint(0, h), rng.randint(0, w)
        rz = rng.randint(2, max(3, d // 3))
        ry = rng.randint(4, h // 3)
        rx = rng.randint(4, w // 3)
        zz, yy, xx = np.ogrid[:d, :h, :w]
        m |= (
            ((zz - cz) / rz) ** 2
            + ((yy - cy) / ry) ** 2
            + ((xx - cx) / rx) ** 2
            <= 1
        ).astype(np.uint8)
    return m


def test_mask_target_vs_skimage_oracle():
    rng = np.random.RandomState(0)
    D, H, W = 32, 96, 96
    ms, msd = 28, 20
    n = 40
    masks = np.stack([_blob_mask(rng, D, H, W) for _ in range(4)])
    boxes = []
    for _ in range(n):
        x1 = rng.randint(0, W - 20)
        x2 = x1 + rng.randint(8, W - x1 - 1)
        y1 = rng.randint(0, H - 20)
        y2 = y1 + rng.randint(8, H - y1 - 1)
        z1 = rng.randint(0, D - 8)
        z2 = z1 + rng.randint(4, D - z1 - 1)
        boxes.append([x1, y1, x2, y2, z1, z2])
    boxes = np.asarray(boxes, np.float32) + rng.rand(n, 6).astype(
        np.float32
    )
    gt_idx = rng.randint(0, 4, n)

    ours = np.asarray(
        mask_target_single(
            jnp.asarray(boxes),
            jnp.ones(n, bool),
            jnp.asarray(gt_idx),
            jnp.asarray(masks),
            ms,
            msd,
        )
    )
    for aa, bound in ((True, 0.01), (False, 0.01)):
        diffs = [
            np.mean(
                _ref_mask_target(
                    masks[gt_idx[i]],
                    boxes[i].astype(np.int32),
                    ms,
                    msd,
                    aa,
                )
                != ours[i]
            )
            for i in range(n)
        ]
        # measured on this fixture: mean 0.55% (anti-aliased oracle) /
        # 0.28% (plain trilinear oracle); per-roi max ~2.9%
        assert float(np.mean(diffs)) < bound, (aa, float(np.mean(diffs)))
