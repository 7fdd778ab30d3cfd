"""Parity checks for the formerly-divergent sampler + mask-target paths.

1. `random_sample` now reproduces the reference's exact semantics:
   above-quota draws WITH replacement (`random_sampler.py:36-39`
   np.random.randint) followed by `.unique()` (base_sampler.py — sorted,
   deduped, realised count below quota), with the negative quota set by
   the DEDUPED positive count.  The tests assert uniqueness/order and
   match the realised-count distribution against the closed-form
   expected distinct count of a with-replacement draw.

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


def test_sampler_negatives_unique_sorted_from_pool():
    """Reference parity: sampled negatives are deduped and sorted
    (torch `.unique()` returns sorted distinct values) and drawn from
    the negative pool only."""
    assigned, num, pf = _sample_geometry()
    assigned_np = np.asarray(assigned)
    sample = jax.jit(lambda k: random_sample(k, assigned, num, pf))
    for seed in range(50):
        res = sample(jax.random.PRNGKey(seed))
        neg = np.asarray(res.neg_inds)[np.asarray(res.neg_mask)]
        assert len(neg) == int(res.neg_count)
        assert np.all(np.diff(neg) > 0), "negatives not unique+sorted"
        assert np.all(assigned_np[neg] == 0), "non-negative index sampled"
        pos = np.asarray(res.pos_inds)[np.asarray(res.pos_mask)]
        assert np.all(np.diff(pos) > 0) if len(pos) > 1 else True
        assert np.all(assigned_np[pos] > 0)


def test_sampler_realised_count_matches_reference_distribution():
    """The realised negative count matches the expected number of
    DISTINCT values in a with-replacement draw: E = n(1-(1-1/n)^q)
    (reference randint + .unique()).  At the reference geometry
    (q=248 draws from n=1992 candidates) E ~= 233; the empirical mean
    over 100 keys must sit within +-3 of it, and below quota whp."""
    assigned, num, pf = _sample_geometry()
    n_pos = int(np.sum(np.asarray(assigned) > 0))
    n_neg = int(np.sum(np.asarray(assigned) == 0))
    # negative quota = num - realised pos count (all 8 positives taken:
    # below the 64 quota, no dedup)
    q = num - min(n_pos, int(round(num * pf)))
    expect = n_neg * (1.0 - (1.0 - 1.0 / n_neg) ** q)
    sample = jax.jit(lambda k: random_sample(k, assigned, num, pf))
    counts = [
        int(sample(jax.random.PRNGKey(seed)).neg_count)
        for seed in range(100)
    ]
    mean = float(np.mean(counts))
    assert abs(mean - expect) < 3.0, (mean, expect)
    assert max(counts) <= q


def test_sampler_neg_quota_uses_deduped_pos_count():
    """base_sampler.py:77-79: num_expected_neg = num - num_sampled_pos
    with the DEDUPED positive count — when positives collide, negatives
    get the freed slots."""
    n_prop, num, pf = 2000, 256, 0.25
    assigned = np.zeros(n_prop, np.int32)
    assigned[:100] = 1  # 100 positives > quota 64 -> draws collide
    assigned = jnp.asarray(assigned)
    sample = jax.jit(lambda k: random_sample(k, assigned, num, pf))
    saw_extra = False
    for seed in range(50):
        res = sample(jax.random.PRNGKey(seed))
        pc, nc = int(res.pos_count), int(res.neg_count)
        assert pc <= 64
        assert nc <= num - pc
        if pc < 64 and nc > num - 64 - 25:
            saw_extra = True  # negatives spilled into freed pos slots
    assert saw_extra


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
