"""Pinned learning-benchmark protocol (VERDICT r2 item 3).

`tools/learning_bench.py` freezes every constant that affects the
learning score (data seeds, geometry, train seed, iters, config, eval
protocol) and records the dataset content hash + 29-stat summary in
LEARNING.json.  These tests stop the protocol drifting silently:

* the synthetic generator is deterministic for the pinned seeds, and
* the data it generates today still hashes to what LEARNING.json's
  recorded score was measured on — if the generator changes, this fails
  loudly instead of the headline number quietly moving (the round-1 ->
  round-2 regression this guards against, VERDICT r2 "What's weak" #3).
"""
import glob
import json
import os

import pytest


def _gen_and_hash(tmpdir):
    from mrcnn3d.data.synthetic import make_synthetic_coco3d

    import importlib.util

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "learning_bench", os.path.join(here, "tools", "learning_bench.py")
    )
    lb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(lb)

    ann_tr, dir_tr = make_synthetic_coco3d(
        os.path.join(tmpdir, "train_data"),
        num_volumes=lb.TRAIN_VOLUMES, hw=lb.HW, depth=lb.DEPTH,
        lesions_per_volume=lb.LESIONS, seed=lb.DATA_SEED_TRAIN,
    )
    ann_va, dir_va = make_synthetic_coco3d(
        os.path.join(tmpdir, "val_data"),
        num_volumes=lb.VAL_VOLUMES, hw=lb.HW, depth=lb.DEPTH,
        lesions_per_volume=lb.LESIONS, seed=lb.DATA_SEED_VAL,
    )
    return lb.sha256_paths(
        [ann_tr, ann_va]
        + glob.glob(os.path.join(dir_tr, "*.npy"))
        + glob.glob(os.path.join(dir_va, "*.npy"))
    )


@pytest.mark.slow
def test_learning_protocol_data_pinned(tmp_path):
    h1 = _gen_and_hash(str(tmp_path / "a"))
    h2 = _gen_and_hash(str(tmp_path / "b"))
    assert h1 == h2, "pinned-seed synthetic data is not deterministic"

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    artifact = os.path.join(here, "LEARNING.json")
    if os.path.exists(artifact):
        rec = json.load(open(artifact))
        assert rec["data_sha256"] == h1, (
            "synthetic generator drifted: LEARNING.json's recorded "
            "score was measured on different data — re-run "
            "tools/learning_bench.py and re-pin"
        )
        # expected-score band: the pinned 1600-iter protocol must stay
        # a LEARNING system (see LEARNING.md for the measured history)
        if rec["protocol"]["iters"] >= 1600:
            assert rec["stats"]["bbox_mAP"] >= 0.30, rec["stats"]
