"""Training API — the reference's train_detector/Runner stack as one loop.

Replaces mmdet/apis/train.py + mmcv Runner: epoch loop, per-iter jitted
step, text logging, checkpoint interval, optional in-loop validation
(CocoDistEvalmAPHook3D equivalent), LR schedule — without the hook
machinery: each concern is a few explicit lines.
"""
from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import Prefetcher
from ..detectors import pipeline as pl
from ..detectors.build import anchor_cfgs, build_detector
from ..parallel.mesh import make_mesh
from ..train import checkpoint as ckpt
from ..train.optim import make_optimizer, step_lr_schedule
from ..train.step import create_train_state, make_train_step


def get_root_logger(log_level=logging.INFO):
    logger = logging.getLogger("mrcnn3d")
    if not logger.handlers:
        # absl (pulled in by jax) installs root handlers that swallow
        # records; attach our own stream handler explicitly
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
        )
        logger.addHandler(handler)
        logger.propagate = False
    logger.setLevel(log_level)
    return logger


def set_random_seed(seed):
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def compute_anchor_sets(cfg, model, variables, shapes):
    """Anchor sets for the static per-scale input shapes [(d,h,w), ...]."""
    acs = anchor_cfgs(cfg)
    allowed = cfg.train_cfg["rpn"].get("allowed_border", 0)
    sets = []
    for (d, h, w), ac in zip(shapes, acs):
        x = jnp.zeros((1, d, h, w, 3))
        feats = jax.eval_shape(
            lambda v: model.apply(variables, v, method=model.extract_feat), x
        )
        fs = [f.shape[1:4] for f in feats]
        sets.append(pl.build_anchor_set(fs, (h, w, 3, d), ac, allowed))
    return sets


def train_shapes(cfg, dataset=None):
    """Static (d, h, w) train-crop shapes per scale.

    Probing one sample from the dataset is authoritative (crop size is a
    function of the volume geometry, reference extra_aug.py:166-168:
    H/4 x W/4 x D); the config static_shapes.crop_size is the fallback
    when no dataset is given.
    """
    if dataset is not None and len(dataset) > 0:
        probe = dataset[0]
        shapes = [probe["imgs"].shape[:3]]
        for key in ("imgs_2", "imgs_3"):
            if key in probe:
                shapes.append(probe[key].shape[:3])
        return shapes
    ss = cfg.get("static_shapes", {})
    ch, cw, cd = ss.get("crop_size", (128, 128, 64))
    up = cfg.get("upscale_factor", 1.5)
    shapes = [(cd, ch, cw)]
    n_scales = 1 + sum(
        1 for k in ("rpn_head_2", "rpn_head_3") if k in cfg.model
    )
    for s in range(1, n_scales):
        f = up**s
        # upscaled crop padded to size_divisor 32 (depth likewise)
        d = int(cd * f)
        h = -(-int(ch * f)) // 32 * 32
        w = -(-int(cw * f)) // 32 * 32
        shapes.append((d, h, w))
    return shapes


def train_detector(cfg, dataset, work_dir=None, seed=0, validate=False,
                   val_dataset=None, max_iters=None, mesh="auto",
                   log_interval=None, profile_steps=None):
    """Main entry (reference tools/train.py -> apis/train.py path).

    profile_steps: (start, stop) iteration bounds for a jax.profiler
    trace written to <work_dir>/profile — the observability hook the
    reference lacks entirely (SURVEY.md section 5: no profiling anywhere).
    """
    logger = get_root_logger()
    rng = set_random_seed(seed)
    work_dir = work_dir or cfg.get("work_dir", "./work_dirs/default")

    # preemption-safe shutdown, installed BEFORE the (minutes-long)
    # model build + first-step compile: TPU pools reclaim VMs with
    # SIGTERM; the handler flags the request and the train loop
    # checkpoints + returns cleanly, so `restore` resumes from the
    # reclaimed step instead of the last interval boundary.  (The
    # reference has no equivalent — mmcv Runner loses everything since
    # the last epoch checkpoint.)
    import signal

    stop = {"sig": None}

    def _on_stop(signum, frame):
        stop["sig"] = signum
        if signum == signal.SIGINT:
            # first ^C requests a graceful checkpoint-and-exit; restore
            # the default handler so a second ^C kills immediately
            # (e.g. when stuck in a long compile)
            try:
                signal.signal(signal.SIGINT, prev_handlers.get(
                    signal.SIGINT, signal.default_int_handler))
            except ValueError:
                pass

    prev_handlers = {}
    for s in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[s] = signal.signal(s, _on_stop)
        except ValueError:  # not the main thread (e.g. a test runner)
            pass

    def _restore_handlers():
        for s, h in prev_handlers.items():
            try:
                signal.signal(s, h)
            except ValueError:
                pass

    try:
        model = build_detector(cfg)
        shapes = train_shapes(cfg, dataset)
        d, h, w = shapes[0]
        init_rng, rng = jax.random.split(rng)
        example = jnp.zeros((1, min(d, 8), min(h, 32), min(w, 32), 3))

        batch_size = cfg.data.get("imgs_per_gpu", 1)
        if mesh == "auto":
            mesh = make_mesh() if len(jax.devices()) > 1 else None
        if mesh is not None:
            batch_size = batch_size * mesh.devices.size
            logger.info("data-parallel mesh over %d devices", mesh.devices.size)

        iters_per_epoch = max(len(dataset) // batch_size, 1)
        sched = step_lr_schedule(
            cfg.optimizer["lr"],
            cfg.lr_config.get("step", []),
            iters_per_epoch,
            cfg.lr_config.get("warmup_iters", 10),
            cfg.lr_config.get("warmup_ratio", 1.0 / 3),
        )
        tx = make_optimizer(
            cfg.optimizer, cfg.optimizer_config.get("grad_clip"), sched
        )
        state = create_train_state(model, init_rng, example, tx)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        n_params = sum(x.size for x in jax.tree.leaves(state.params))
        logger.info("model built: %.1fM params", n_params / 1e6)

        anchor_sets = compute_anchor_sets(cfg, model, variables, shapes)
        step_fn = make_train_step(model, tx, cfg, anchor_sets, mesh=mesh)

        manager = ckpt.make_manager(work_dir)
        restored = ckpt.restore(manager, state)
        if restored is not None:
            state = restored
            logger.info("resumed from step %d", int(state.step))

        total_epochs = cfg.get("total_epochs", 1)
        ckpt_interval = cfg.get("checkpoint_config", {}).get("interval", 5)
        log_interval = log_interval or cfg.get("log_config", {}).get(
            "interval", 1
        )

        # per-host data sharding (reference DistributedGroupSampler role):
        # each process loads its own deterministic shard of every epoch,
        # sized batch/world; globalize_batch assembles the global
        # 'data'-sharded arrays from the local rows before the step
        rank, world = jax.process_index(), jax.process_count()
        per_host_bs = batch_size
        if world > 1:
            assert mesh is not None, "multi-process training needs a mesh"
            assert batch_size % world == 0, (batch_size, world)
            per_host_bs = batch_size // world
            # pjit inputs must be GLOBAL arrays in multi-process runs:
            # lift the (identical per-host, same init seed) state into
            # replicated global arrays once; step_rng below likewise
            from ..parallel.mesh import replicated

            rep = replicated(mesh)
            state = jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    rep, np.asarray(x)
                ),
                state,
            )

        it = int(state.step)
        t_start = time.time()
        t_last = t_start
        profiling = False
        multiproc_compiled = False
        for epoch in range(it // iters_per_epoch, total_epochs):
            loader = Prefetcher(
                dataset, per_host_bs, epoch=epoch, shuffle=True,
                seed=seed, rank=rank, world=world,
                num_workers=cfg.data.get("workers_per_gpu", 4),
                mode=cfg.data.get("loader_mode", "thread"),
                device_put=(world == 1),
            )
            for batch in loader:
                batch.pop("img_info", None)
                if world > 1:
                    from ..parallel.mesh import globalize_batch

                    batch = globalize_batch(mesh, batch)
                if profile_steps and it == profile_steps[0] and not profiling:
                    jax.profiler.start_trace(
                        str(work_dir) + "/profile"
                    )
                    profiling = True
                rng, step_rng = jax.random.split(rng)
                if world > 1:
                    step_rng = jax.make_array_from_process_local_data(
                        rep, np.asarray(step_rng)
                    )
                    if not multiproc_compiled:
                        # compile BEFORE touching the collectives, then
                        # align hosts: Gloo's context handshake times
                        # out at ~30 s but cold compiles skew by
                        # minutes.  Swap in the compiled executable —
                        # .lower().compile() does not seed the jit
                        # dispatch cache, and shapes are static anyway.
                        from ..parallel.mesh import process_barrier

                        step_fn = step_fn.lower(
                            state, batch, step_rng
                        ).compile()
                        process_barrier("mrcnn3d_train_compiled")
                        multiproc_compiled = True
                state, metrics = step_fn(state, batch, step_rng)
                it += 1
                if profiling and it >= profile_steps[1]:
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                    profiling = False
                    logger.info("profiler trace written to %s/profile", work_dir)
                if it % log_interval == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    now = time.time()
                    dt = (now - t_last) / log_interval
                    t_last = now
                    logger.info(
                        "epoch %d iter %d lr %.2e loss %.4f %.2fs/it | %s",
                        epoch,
                        it,
                        float(sched(it)),
                        m["loss"],
                        dt,
                        " ".join(
                            f"{k}:{v:.3f}" for k, v in m.items() if k != "loss"
                        ),
                    )
                if stop["sig"] is not None:
                    ckpt.save(manager, state, it)
                    manager.wait_until_finished()
                    logger.info(
                        "signal %s: checkpointed step %d and stopped",
                        stop["sig"], it,
                    )
                    return state
                if max_iters and it >= max_iters:
                    ckpt.save(manager, state, it)
                    manager.wait_until_finished()
                    return state
            if (epoch + 1) % ckpt_interval == 0:
                ckpt.save(manager, state, it)
            if validate and val_dataset is not None and (
                (epoch + 1) % cfg.get("interval", 5) == 0
            ):
                from .test_api import evaluate_dataset

                # rank-strided validation shard, all-gathered before scoring
                # (reference eval_hooks.py:111-149)
                stats = evaluate_dataset(
                    cfg, model, state, val_dataset,
                    rank=jax.process_index(), world=jax.process_count(),
                )
                logger.info("eval @ epoch %d: %s", epoch, stats)
        ckpt.save(manager, state, it)
        manager.wait_until_finished()
        logger.info("training done in %.1fs", time.time() - t_start)
        return state
    finally:
        _restore_handlers()
