"""RPN proposal-generation semantics (reference get_bboxes_single)."""
import jax.numpy as jnp
import numpy as np

from mrcnn3d.core.anchors import AnchorGenerator3D, anchor_inside_flags
from mrcnn3d.detectors.pipeline import AnchorSet, gen_proposals_single
from mrcnn3d.ops.box3d import delta2bbox3d

CFG = dict(nms_pre=64, nms_post=32, max_num=32, nms_thr=0.7)


def _single_level(d=4, h=8, w=8):
    gen = AnchorGenerator3D(4, [2], [2], [1.0], 2)
    anchors = gen.grid_anchors((d, h, w), 4, 2)
    inside = anchor_inside_flags(
        anchors, np.ones(len(anchors), bool), (32, 32, 3, 8), 0
    )
    return AnchorSet([anchors], [np.asarray(inside)]), anchors


def test_top_anchor_becomes_top_proposal():
    aset, anchors = _single_level()
    n = len(anchors)
    cls = np.full((4, 8, 8, 1), -8.0, np.float32)
    cls[2, 3, 3, 0] = 6.0  # one confident anchor
    reg = np.zeros((4, 8, 8, 6), np.float32)

    boxes, scores, valid = gen_proposals_single(
        [jnp.asarray(cls)], [jnp.asarray(reg)], aset,
        (32, 32, 3, 8), CFG,
    )
    boxes, scores, valid = map(np.asarray, (boxes, scores, valid))
    assert valid[0]
    # zero deltas -> top proposal equals the anchor (clipped to volume)
    flat_idx = (2 * 8 + 3) * 8 + 3
    expected = np.asarray(
        delta2bbox3d(
            jnp.asarray(anchors[flat_idx : flat_idx + 1]),
            jnp.zeros((1, 6)),
            max_shape=(32, 32, 3, 8),
        )
    )[0]
    np.testing.assert_allclose(boxes[0], expected, atol=1e-4)
    assert scores[0] > 0.99


def test_duplicate_anchors_suppressed_by_nms():
    aset, anchors = _single_level()
    cls = np.full((4, 8, 8, 1), -8.0, np.float32)
    # two neighbouring cells along x -> heavily-overlapping proposals
    cls[2, 3, 3, 0] = 6.0
    cls[2, 3, 4, 0] = 5.0
    reg = np.zeros((4, 8, 8, 6), np.float32)
    # shift the second anchor's box onto the first via deltas
    reg[2, 3, 4, 0] = -4.0 / 8.0  # dx = -stride/anchor_w
    boxes, scores, valid = gen_proposals_single(
        [jnp.asarray(cls)], [jnp.asarray(reg)], aset,
        (32, 32, 3, 8), CFG,
    )
    boxes, scores, valid = map(np.asarray, (boxes, scores, valid))
    # identical boxes after decode -> only one survives
    kept = boxes[valid]
    top = kept[0]
    dup = np.all(np.abs(kept - top) < 1e-3, axis=1)
    assert dup.sum() == 1


def test_outside_anchors_filtered_when_over_budget():
    aset, anchors = _single_level()
    n = len(anchors)
    small_cfg = dict(nms_pre=16, nms_post=16, max_num=16, nms_thr=0.7)
    # all scores high; outside anchors (inside=False) must not win slots
    cls = np.full((4, 8, 8, 1), 4.0, np.float32)
    reg = np.zeros((4, 8, 8, 6), np.float32)
    boxes, scores, valid = gen_proposals_single(
        [jnp.asarray(cls)], [jnp.asarray(reg)], aset,
        (32, 32, 3, 8), small_cfg,
    )
    inside = aset.inside[0]
    inside_boxes = {
        tuple(np.round(b, 2))
        for b in np.asarray(
            delta2bbox3d(
                jnp.asarray(anchors[inside]),
                jnp.zeros((int(inside.sum()), 6)),
                max_shape=(32, 32, 3, 8),
            )
        ).tolist()
    }
    for b, v in zip(np.asarray(boxes), np.asarray(valid)):
        if v:
            assert tuple(np.round(b, 2)) in inside_boxes


def test_chunked_cond_map_edges():
    """Helper semantics: remainder padding, all-invalid chunk skip
    (zeros), chunk > n clamp, validity passed as the last operand."""
    import jax
    import jax.numpy as jnp

    from mrcnn3d.detectors.pipeline import _chunked_cond_map

    n = 37
    x = jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3)
    valid = jnp.arange(n) < 20  # padding last, like NMS output

    calls = []

    def fn(x_c, v_c):
        calls.append(1)
        return x_c * 2.0

    out = _chunked_cond_map(fn, 16, valid, x)
    assert out.shape == (n, 3)
    # real rows transformed
    np.testing.assert_allclose(np.asarray(out[:20]), np.asarray(x[:20]) * 2)
    # rows in fully-skipped chunks (32..36 live in chunk 2, all-invalid
    # since valid stops at 20) come back zero
    np.testing.assert_allclose(np.asarray(out[32:]), 0.0)
    # chunk > n clamps
    out2 = _chunked_cond_map(fn, 512, valid, x)
    np.testing.assert_allclose(
        np.asarray(out2[:20]), np.asarray(x[:20]) * 2
    )
