"""NMS3D kernel vs numpy oracle (reference CUDA devIoU3d semantics)."""
import numpy as np
import jax.numpy as jnp

from mrcnn3d.ops.nms3d import (
    nms_3d,
    nms_3d_mask,
    nms_3d_numpy,
    nms_3d_overlap_numpy,
)


def _random_dets(rng, n, span=60):
    x1 = rng.uniform(0, span, n)
    y1 = rng.uniform(0, span, n)
    z1 = rng.uniform(0, span / 3, n)
    dets = np.stack(
        [
            x1,
            y1,
            x1 + rng.uniform(4, 30, n),
            y1 + rng.uniform(4, 30, n),
            z1,
            z1 + rng.uniform(2, 12, n),
            rng.uniform(0, 1, n),
        ],
        axis=-1,
    ).astype(np.float32)
    return dets


def test_jit_nms_matches_oracle():
    rng = np.random.RandomState(42)
    for trial in range(5):
        dets = _random_dets(rng, 64)
        for thr in (0.3, 0.5, 0.7):
            expected = set(nms_3d_numpy(dets, thr))
            keep = nms_3d_mask(
                jnp.asarray(dets[:, :6]),
                jnp.asarray(dets[:, 6]),
                jnp.ones(64, bool),
                thr,
            )
            got = set(np.flatnonzero(np.asarray(keep)).tolist())
            assert got == expected, f"trial {trial} thr {thr}"


def test_nms_respects_valid_mask():
    rng = np.random.RandomState(1)
    dets = _random_dets(rng, 32)
    valid = np.zeros(32, bool)
    valid[:10] = True
    keep = nms_3d_mask(
        jnp.asarray(dets[:, :6]),
        jnp.asarray(dets[:, 6]),
        jnp.asarray(valid),
        0.5,
    )
    keep = np.asarray(keep)
    assert not keep[10:].any()
    expected = set(nms_3d_numpy(dets[:10], 0.5))
    assert set(np.flatnonzero(keep[:10]).tolist()) == expected


def test_nms_topk_output():
    rng = np.random.RandomState(7)
    dets = _random_dets(rng, 128)
    boxes, scores, valid = nms_3d(
        jnp.asarray(dets[:, :6]),
        jnp.asarray(dets[:, 6]),
        jnp.ones(128, bool),
        0.5,
        16,
    )
    scores = np.asarray(scores)
    valid = np.asarray(valid)
    expected = nms_3d_numpy(dets, 0.5)[:16]
    # survivors come back sorted by descending score
    n = min(len(expected), 16)
    np.testing.assert_allclose(
        scores[:n], dets[expected[:n], 6], rtol=1e-6
    )
    assert valid[:n].all()


def test_identical_boxes_suppressed():
    box = [10, 10, 30, 30, 2, 8]
    dets = np.array([box + [0.9], box + [0.8], box + [0.7]], np.float32)
    keep = nms_3d_mask(
        jnp.asarray(dets[:, :6]),
        jnp.asarray(dets[:, 6]),
        jnp.ones(3, bool),
        0.5,
    )
    assert np.asarray(keep).tolist() == [True, False, False]


def test_overlap_nms_eval_variant():
    # the eval-merge variant uses inter/vol(other): a small box fully
    # inside a big low-scoring box suppresses the big one at low thr
    dets = np.array(
        [
            [0, 0, 100, 100, 0, 20, 0.9],
            [10, 10, 20, 20, 5, 10, 0.95],
        ],
        np.float32,
    )
    pick = nms_3d_overlap_numpy(dets, 0.1)
    # the small box (idx 1, higher score) is picked first; overlap of
    # big box = inter / vol(big) is small -> big survives too
    assert pick[0] == 1 and 0 in pick

    # reversed: small fully covered by itself relative to small's volume
    dets2 = np.array(
        [
            [0, 0, 100, 100, 0, 20, 0.95],
            [10, 10, 20, 20, 5, 10, 0.9],
        ],
        np.float32,
    )
    pick2 = nms_3d_overlap_numpy(dets2, 0.1)
    # big picked first; small's overlap = inter / vol(small) = 1 -> gone
    assert pick2 == [0]


def test_pallas_kernel_matches_oracle_interpret():
    """Pallas NMS kernel (interpreter mode on CPU) == numpy oracle."""
    from mrcnn3d.ops.nms3d_pallas import nms_3d_mask_pallas

    rng = np.random.RandomState(5)
    dets = _random_dets(rng, 96)
    valid = np.ones(96, bool)
    valid[90:] = False
    for thr in (0.3, 0.7):
        keep = nms_3d_mask_pallas(
            jnp.asarray(dets[:, :6]),
            jnp.asarray(dets[:, 6]),
            jnp.asarray(valid),
            thr,
            interpret=True,
        )
        got = set(np.flatnonzero(np.asarray(keep)).tolist())
        want = set(nms_3d_numpy(dets[:90], thr))
        assert got == want, thr
