#!/usr/bin/env python
"""Trained-offsets windowed-MSDA accuracy experiment (ROADMAP round 4;
VERDICT r3 next-step #2).

Released VG checkpoints are unavailable in this container, so the windowed
(banded) MSDA approximation has only been accuracy-checked against the
DIRECTIONAL INIT of the sampling offsets. This experiment closes that gap
as far as synthetic data allows:

  1. ``train``: fit the full EGTR model from scratch on the learnable
     synthetic VG set (scripts/make_synth_vg.py) at the FPS-protocol shape
     (600x1000 -> one 608x1008 bucket, ONE compiled train program), long
     enough for the encoder sampling offsets to move well off their init.
  2. ``sweep``: on the trained params, (a) histogram the actual encoder
     sampling offsets in level pixels (what band height must contain),
     (b) evaluate exact vs win16 vs win32 on the synthetic test split:
     R@k deltas + raw pred_rel / logits deltas.

Outputs JSON records to --out for the ROADMAP table.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _model_kw(args):
    if not args.tiny:  # full EGTR architecture
        return {}
    # --tiny: CPU smoke-test scale for validating the script end-to-end
    return dict(d_model=64, encoder_layers=2, decoder_layers=2,
                encoder_ffn_dim=64, decoder_ffn_dim=64, num_queries=16)


def _bucket(args):
    return ((-(-args.size // 16) * 16, -(-args.max_size // 16) * 16),)


def build(args):
    import jax
    import jax.numpy as jnp

    from egtr_tpu.config import EgtrConfig
    from egtr_tpu.data.loader import Loader
    from egtr_tpu.data.visual_genome import VGDataset, vg_get_statistics
    from egtr_tpu.models.egtr import EgtrModel, compute_freq_dists

    train_ds = VGDataset(args.data_path, "train", size=args.size,
                         max_size=args.max_size)
    num_rel = len(train_ds.rel_categories)
    cfg = EgtrConfig(
        num_labels=train_ds.num_classes(), num_rel_labels=num_rel,
        compute_dtype="bfloat16", max_gt_boxes=16, max_gt_rels=64,
        msda_window=args.window, msda_band=args.band,
        **(_model_kw(args) or {"num_queries": 200}))
    loader = Loader(train_ds, args.batch, shuffle=True, drop_last=True,
                    max_gt=cfg.max_gt_boxes, num_rel_labels=num_rel,
                    buckets=_bucket(args), num_workers=2)
    model = EgtrModel(cfg)
    fg = vg_get_statistics(train_ds)
    return cfg, model, loader, fg, train_ds


def cmd_train(args):
    import jax
    import jax.numpy as jnp

    from egtr_tpu.models.egtr import compute_freq_dists
    from egtr_tpu.train.checkpoint import (CheckpointManager, save_pretrained)
    from egtr_tpu.train.optim import make_optimizer
    from egtr_tpu.train.train_step import create_state, make_train_step

    if args.resume:
        # Resume must reproduce the producing run's architecture: rebuild
        # cfg from the artifact's config.json, not from CLI flags (numeric
        # flag drift would otherwise silently train a different config and
        # overwrite the artifact).
        from egtr_tpu.config import EgtrConfig
        saved = EgtrConfig.load(
            os.path.join(args.out, "artifact", "config.json"))
        cfg, model, loader, fg, _ = build(args)
        if saved != cfg:
            diff = [f for f in saved.__dataclass_fields__
                    if getattr(saved, f) != getattr(cfg, f)]
            raise SystemExit(
                f"--resume: CLI-derived config disagrees with the "
                f"artifact's on fields {diff}; rerun with matching flags")
    else:
        cfg, model, loader, fg, _ = build(args)
    rng = jax.random.PRNGKey(args.seed)
    rng, init_key = jax.random.split(rng)
    h, w = loader.init_shape
    params = jax.jit(model.init)(
        init_key, jnp.zeros((1, h, w, 3), jnp.float32))
    rel_dist, triplet_dist = compute_freq_dists(fg, cfg.freq_bias_eps,
                                                cfg.use_log_softmax)
    params["params"]["rel_dist"] = rel_dist
    params["params"]["triplet_dist"] = triplet_dist

    if args.init_from:
        # adaptation fine-tune: warm-start the WEIGHTS from a finished
        # run's artifact (e.g. the exact-MSDA step-6000 model) and train
        # under a DIFFERENT msda_window/band so offsets and attention
        # adapt to the band structure. Weights-only by design — this is a
        # new phase in a new run dir, so fresh Adam moments are correct
        # (unlike --resume, which restores the full TrainState).
        import chex
        from egtr_tpu.train.checkpoint import load_pretrained
        init_cfg, init_params = load_pretrained(args.init_from)
        arch_fields = [f for f in init_cfg.__dataclass_fields__
                       if not f.startswith("msda_")
                       and getattr(init_cfg, f) != getattr(cfg, f)]
        if arch_fields:
            raise SystemExit(
                f"--init_from: architecture disagrees on {arch_fields}; "
                f"only msda_* fields may differ for an adaptation run")
        chex.assert_trees_all_equal_shapes(params, init_params)
        params = init_params

    # accelerated from-scratch recipe: offsets sit in the "backbone" LR
    # group (optim.param_label), so lr_backbone controls how fast they
    # move; flat-ish high LRs are deliberate — the goal is offsets FAR
    # from init (a pessimistic spread for the window), not SOTA fitting
    tx = make_optimizer(lr=args.lr, lr_backbone=args.lr_backbone,
                        lr_initialized=None, initialized_paths=[])
    state = create_state(params, tx)
    mngr = CheckpointManager(os.path.join(args.out, "state"), max_to_keep=2)
    if args.resume:
        # full-TrainState resume: params AND AdamW moments AND the step
        # counter (a weights-only warm start restarts Adam cold at these
        # flat high LRs and double-counts step numbers in the log)
        restored = mngr.restore(state)
        if restored is None:
            raise SystemExit(f"--resume: no state checkpoint under "
                             f"{args.out}/state")
        state = restored
    from egtr_tpu.utils.aot import maybe_aot
    step_fn = maybe_aot(make_train_step(model, cfg, tx, task="sgg"),
                        tag="exp_train")

    t0 = None  # clock starts at the FIRST COMPLETED step: the train-step
    # compile over the axon tunnel is minutes and must not eat the budget
    step = int(state.step)
    log = open(os.path.join(args.out, "train_log.jsonl"), "a")
    # run-header record: resumed runs append to the same file, and without
    # a delimiter the mixed clocks/step ranges cannot be parsed into runs
    log.write(json.dumps({
        "run_header": True, "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                 time.gmtime()),
        "resume": bool(args.resume), "start_step": step,
        "args": {k: v for k, v in vars(args).items()}}) + "\n")
    log.flush()
    while t0 is None or time.time() - t0 < args.train_seconds:
        epoch_steps = 0
        for batch in loader:
            rng, k = jax.random.split(rng)
            state, metrics = step_fn(state, batch, k)
            step += 1
            epoch_steps += 1
            if t0 is None:
                jax.block_until_ready(metrics)
                t0 = time.time()
            if step % 50 == 0:
                m = {k_: float(v) for k_, v in metrics.items()}
                rec = {"step": step, "sec": round(time.time() - t0, 1),
                       "total_loss": m["total_loss"],
                       "loss_rel": m.get("loss_rel"),
                       "loss_ce": m.get("loss_ce"),
                       "loss_bbox": m.get("loss_bbox")}
                log.write(json.dumps(rec) + "\n")
                log.flush()
                print(rec, flush=True)
            if step % args.ckpt_every == 0:
                save_pretrained(os.path.join(args.out, "artifact"), cfg,
                                state.params)
                mngr.save(step, state, force=True)
            if time.time() - t0 >= args.train_seconds:
                break
        if epoch_steps == 0:
            raise SystemExit("loader yielded no batches — dataset empty or "
                             "every image filtered out")
    save_pretrained(os.path.join(args.out, "artifact"), cfg, state.params)
    if mngr.latest_step() != step:
        mngr.save(step, state, force=True)
    print(f"[exp] trained to step {step} in {time.time()-(t0 or time.time()):.0f}s"
          f" this run; artifact at {args.out}/artifact", flush=True)


def _clamp_fracs(enc_offs, enc_aws, shapes, D):
    """Attention-weighted fraction of in-image encoder samples CLAMPED by
    each (window, band) variant — computed with the production band
    machinery (query_tile / segment_rows / window_rows) on the captured
    offsets, so it is exactly the approximation's miss rate without any
    extra model compile. enc_offs/enc_aws: per-layer lists of
    [B,Q,H,L,P,2] offsets (level px) and softmaxed [B,Q,H,L,P] weights."""
    import jax.numpy as jnp

    from egtr_tpu.ops.msda_window import (query_tile, segment_bounds,
                                          segment_rows, window_rows)

    Q = sum(h * w for h, w in shapes)
    # encoder reference points = each query's own raster center,
    # normalized per level (valid_ratios = 1 on unpadded images)
    refs = []
    for (h, w) in shapes:
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        refs.append(np.stack([(xx.ravel() + 0.5) / w,
                              (yy.ravel() + 0.5) / h], -1))
    ref = np.concatenate(refs, 0)                            # [Q, 2]
    segs = segment_bounds(Q, shapes)

    out = {}
    for win in (8, 16, 32):
        sums = {"tile": [0.0, 0.0], "point": [0.0, 0.0]}  # [clamped, in]
        for off, aw in zip(enc_offs, enc_aws):
            for lid, (h, w) in enumerate(shapes):
                if h <= win:
                    continue
                TQ = query_tile(win, D, w)
                loc_y = ref[None, :, None, None, 1] \
                    + off[:, :, :, lid, :, 1] / h            # [B,Q,H,P]
                iy = segment_rows(jnp.asarray(loc_y * h - 0.5), segs, TQ)
                awr = segment_rows(jnp.asarray(aw[:, :, :, lid]), segs, TQ)
                for band in ("tile", "point"):
                    _, _, _, awe, inband, in_img = window_rows(
                        iy, awr, h, win, TQ, per_point=band == "point")
                    w_in = np.asarray(jnp.where(in_img, awe, 0.0))
                    sums[band][0] += float((w_in * ~np.asarray(inband)
                                            ).sum())
                    sums[band][1] += float(w_in.sum())
        for band, (csum, wsum) in sums.items():
            out[f"clamp_frac_win{win}_{band}"] = (
                csum / wsum if wsum else 0.0)
    return out


def _offset_stats(model, cfg, params, batch):
    """Histogram the ENCODER sampling offsets (raw Dense outputs are in
    level pixels — deformable_detr.py:1066-1073 normalizes by (w, h))."""
    import jax
    import jax.numpy as jnp

    def filt(mdl, _method):
        return getattr(mdl, "name", None) in ("sampling_offsets",
                                              "attention_weights")

    _, inter = model.apply(
        params, jnp.asarray(batch["pixel_values"]),
        jnp.asarray(batch["pixel_mask"]), deterministic=True,
        capture_intermediates=filt, mutable=["intermediates"])
    flat = jax.tree_util.tree_flatten_with_path(inter)[0]
    H, L, P = (cfg.encoder_attention_heads, cfg.num_feature_levels,
               cfg.encoder_n_points)
    stats = {}
    enc_all = []
    enc_aws = {}
    for path, v in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        # NOT plain "encoder": the decoder cross-attention module is
        # named `encoder_attn` and would leak decoder offsets in here
        if "encoder_layer_" not in name:
            continue
        layer = name.split("encoder_layer_")[-1].split("/")[0]
        if "attention_weights" in name:
            aw = jax.nn.softmax(
                np.asarray(v).reshape(v.shape[0], v.shape[1], H, L * P),
                axis=-1)
            enc_aws[layer] = np.asarray(aw).reshape(
                v.shape[0], v.shape[1], H, L, P)
            continue
        off = np.asarray(v).reshape(v.shape[0], v.shape[1], H, L, P, 2)
        enc_all.append((layer, off))
    enc_all.sort(key=lambda t: t[0])
    ordered_aws = [enc_aws[lyr] for lyr, _ in enc_all if lyr in enc_aws]
    enc_all = [off for _, off in enc_all]
    if enc_all:
        raw = np.concatenate(enc_all, axis=1)       # [B,Q,H,L,P,2] signed
        off = np.abs(raw)
        for axis, nm in ((0, "x"), (1, "y")):
            a = off[..., axis].ravel()
            stats[f"enc_|{nm}|_p50"] = float(np.percentile(a, 50))
            stats[f"enc_|{nm}|_p90"] = float(np.percentile(a, 90))
            stats[f"enc_|{nm}|_p99"] = float(np.percentile(a, 99))
            stats[f"enc_|{nm}|_max"] = float(a.max())
        # fraction of y-offsets a half-band of win/2 contains — the
        # band="tile" clamp criterion (one band per query tile, so a
        # point's MEAN offset eats into the slack)
        ay = off[..., 1].ravel()
        for win in (16, 32):
            stats[f"enc_y_within_{win//2}px"] = float(
                (ay <= win / 2).mean())
        # band="point" criterion: each point has its own band, so only
        # the DEVIATION of a point's y-offset from that point's mean
        # (per LAYER/head/level/point, across queries — each encoder
        # layer has its own offsets Dense and selects bands
        # independently, so the mean must not pool layers) can clamp.
        # This per-(layer,H,L,P) global deviation upper-bounds the
        # within-tile deviation the kernel actually sees.
        dev = np.concatenate(
            [np.abs(o[..., 1] - o[..., 1].mean(axis=1, keepdims=True))
             for o in enc_all], axis=1)
        d = dev.ravel()
        stats["enc_y_dev_pp_p90"] = float(np.percentile(d, 90))
        stats["enc_y_dev_pp_p99"] = float(np.percentile(d, 99))
        stats["enc_y_dev_pp_max"] = float(d.max())
        for win in (16, 32):
            stats[f"enc_y_dev_pp_within_{win//2}px"] = float(
                (d <= win / 2).mean())
        # exact clamp fractions through the production band machinery
        if len(ordered_aws) == len(enc_all):
            Hpix, Wpix = batch["pixel_values"].shape[1:3]
            shapes = tuple((-(-Hpix // s), -(-Wpix // s))
                           for s in (8, 16, 32, 64))[:L]
            stats.update(_clamp_fracs(enc_all, ordered_aws, shapes,
                                      cfg.d_model // H))
    return stats


def _sweep_eval(model, cfg, params, ds, batch_size, buckets):
    """One compiled program per window: raw heads + device-side top-k
    postprocess together (avoids a second full-model compile per window
    — axon-tunnel compiles are minutes each). Returns (recall metrics,
    raw outputs of the first batch)."""
    import jax
    import jax.numpy as jnp

    from egtr_tpu.data.loader import Loader
    from egtr_tpu.evaluation.postprocess import (rescale_boxes_np,
                                                 sgg_postprocess)
    from egtr_tpu.evaluation.sg_eval import (SceneGraphEvaluator,
                                             evaluate_mean_recall,
                                             evaluate_per_predicate)

    @jax.jit
    def infer(params, pv, pm):
        out = model.apply(params, pv, pm, deterministic=True)
        post = sgg_postprocess(
            out["logits"], out["pred_boxes"], out["pred_rel"],
            out["pred_connectivity"], num_labels=cfg.num_labels, top_k=100)
        post["raw"] = {k: out[k] for k in (
            "logits", "pred_boxes", "pred_rel", "pred_connectivity")}
        return post

    # EGTR_AOT_CACHE=1: each (window, band, int8) variant is its own
    # program; warm re-sweeps after further training load in ~1-2 s
    # instead of recompiling minutes of Mosaic kernels (utils/aot.py)
    from egtr_tpu.utils.aot import maybe_aot
    tag = (f"sweep_w{cfg.msda_window}{cfg.msda_band[0]}"
           + ("_i8" if cfg.msda_int8 else ""))
    infer = maybe_aot(infer, tag=tag)

    loader = Loader(ds, batch_size, shuffle=False, max_gt=cfg.max_gt_boxes,
                    num_rel_labels=cfg.num_rel_labels,
                    buckets=buckets, num_workers=2)
    single = SceneGraphEvaluator(multiple_preds=False)
    per_pred = {n: SceneGraphEvaluator(multiple_preds=False)
                for n in ds.rel_categories}
    raw0 = None
    for bi, batch in enumerate(loader):
        post = infer(params, jnp.asarray(batch["pixel_values"]),
                     jnp.asarray(batch["pixel_mask"]))
        # the raw Q^2-sized head outputs are only compared for batch 0 —
        # don't fetch ~30 MB/batch of them over the axon tunnel
        raw = post.pop("raw")
        post = jax.tree.map(np.asarray, post)
        if bi == 0:
            raw0 = jax.tree.map(np.asarray, raw)
        del raw
        for j in range(batch["pixel_values"].shape[0]):
            if "valid" in batch and not batch["valid"][j]:
                continue
            n_gt = int(batch["labels"]["num_boxes"][j])
            if n_gt == 0:
                continue
            rel_dense = batch["labels"]["rel"][j, :n_gt, :n_gt]
            gt_rels = np.argwhere(rel_dense > 0)
            if len(gt_rels) == 0:
                continue
            orig_hw = batch["orig_size"][j]
            gt_entry = {
                "gt_relations": gt_rels,
                "gt_boxes": rescale_boxes_np(
                    batch["labels"]["boxes"][j, :n_gt], orig_hw),
                "gt_classes": batch["labels"]["class_labels"][j, :n_gt],
            }
            entry = {
                "pred_boxes": rescale_boxes_np(post["pred_boxes"][j],
                                               orig_hw),
                "pred_classes": post["pred_classes"][j],
                "obj_scores": post["obj_scores"][j],
                "pred_rel_inds": post["single_inds"][j],
                "rel_scores": post["single_rel_vec"][j],
            }
            single.evaluate_entry(gt_entry, entry)
            evaluate_per_predicate(gt_entry, entry, per_pred,
                                   ds.rel_categories)
    metrics = dict(single.aggregate())
    metrics.update(evaluate_mean_recall(
        {n: e.aggregate() for n, e in per_pred.items()},
        len(ds.rel_categories)))
    return metrics, raw0


def cmd_sweep(args):
    from egtr_tpu.data.visual_genome import VGDataset
    from egtr_tpu.data.loader import Loader
    from egtr_tpu.models.egtr import EgtrModel
    from egtr_tpu.train.checkpoint import load_pretrained

    cfg, params = load_pretrained(os.path.join(args.out, "artifact"))
    cfg = cfg.replace(dropout=0.0)
    if args.tiny:
        cfg = cfg.replace(**_model_kw(args))
    test_ds = VGDataset(args.data_path, "test", size=args.size,
                        max_size=args.max_size)

    # The report is INCREMENTAL: each axon-tunnel compile is minutes, so
    # every finished variant is persisted immediately, already-measured
    # variants are skipped on re-invocation, and the exact path's batch-0
    # raw outputs are cached on disk so later runs can compute deltas
    # without recompiling the exact program.
    path = os.path.join(args.out, "window_sweep.json")
    report = json.load(open(path)) if os.path.exists(path) else {}
    off_path = os.path.join(args.out, "offset_stats.json")
    if os.path.exists(off_path):  # produced by the CPU `offsets` run
        report["offsets"] = json.load(open(off_path))
    npz_path = os.path.join(args.out, "exact_raw0.npz")
    raw0 = dict(np.load(npz_path)) if os.path.exists(npz_path) else None

    # window tokens: "16" = per-tile band, "16p" = per-point bands,
    # trailing "i" = int8 stage-1 on top (e.g. "16pi")
    variants = []
    for tok in args.windows.split(","):
        tok = tok.strip()
        if not tok:
            continue
        int8 = tok.endswith("i")
        tok = tok.rstrip("i")
        band = "point" if tok.endswith("p") else "tile"
        variants.append((int(tok.rstrip("p")), band, int8))
    if args.int8:
        # de-asterisk the OTHER opt-in lever on the same trained weights
        variants += [(0, "tile", True), (16, "tile", True)]

    def flush():
        with open(path, "w") as f:
            json.dump(report, f, indent=2)

    for win, band, int8 in variants:
        key = (f"win{win}" + ("_pp" if band == "point" else "")
               + ("_int8" if int8 else ""))
        exact = (win, int8) == (0, False)
        if key in report and (raw0 is not None or not exact):
            print(f"[exp] {key}: already measured, skipping", flush=True)
            continue
        c = cfg.replace(msda_window=win, msda_band=band, msda_int8=int8)
        t0 = time.time()
        metrics, raw = _sweep_eval(
            EgtrModel(c), c, params, test_ds, args.batch, _bucket(args))
        raw = {k: np.asarray(v, np.float32) for k, v in raw.items()}
        report.setdefault(key, {
            **{k: metrics.get(k) for k in
               ("R@20", "R@50", "R@100", "mR@20", "mR@50", "mR@100")},
            "compile_plus_eval_sec": round(time.time() - t0, 1),
        })
        print(f"[exp] {key}: {report[key]}", flush=True)
        if exact:
            raw0 = raw
            np.savez(npz_path, **raw)
        elif raw0 is not None:
            deltas = {}
            for k in raw0:
                d = np.abs(raw[k].astype(np.float64)
                           - raw0[k].astype(np.float64))
                scale = float(np.abs(raw0[k]).max()) or 1.0
                deltas[k] = {"max_abs": float(d.max()),
                             "mean_abs": float(d.mean()),
                             "max_rel_of_scale": float(d.max() / scale)}
            report[f"{key}_vs_exact_outputs"] = deltas
        flush()

    flush()
    print(f"[exp] report written to {path}", flush=True)


def cmd_offsets(args):
    """Offset histogram on CPU (run with JAX_PLATFORMS=cpu: an unjitted
    capture-intermediates forward over the axon tunnel would dispatch
    op-by-op, and jitting it would cost a fourth full-model compile)."""
    from egtr_tpu.data.loader import Loader
    from egtr_tpu.data.visual_genome import VGDataset
    from egtr_tpu.models.egtr import EgtrModel
    from egtr_tpu.train.checkpoint import load_pretrained

    cfg, params = load_pretrained(os.path.join(args.out, "artifact"))
    cfg = cfg.replace(dropout=0.0, msda_window=0, msda_impl="gather")
    test_ds = VGDataset(args.data_path, "test", size=args.size,
                        max_size=args.max_size)
    batch0 = next(iter(Loader(
        test_ds, min(args.batch, 2), shuffle=False, max_gt=cfg.max_gt_boxes,
        num_rel_labels=cfg.num_rel_labels, buckets=_bucket(args),
        num_workers=2)))
    stats = _offset_stats(EgtrModel(cfg), cfg, params, batch0)
    path = os.path.join(args.out, "offset_stats.json")
    with open(path, "w") as f:
        json.dump(stats, f, indent=2)
    print("[exp] offset stats:", stats, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["train", "sweep", "offsets"])
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--lr_backbone", type=float, default=5e-5)
    ap.add_argument("--init_from", default=None,
                    help="train-time weights-only warm start from a "
                         "finished run's artifact dir (adaptation "
                         "fine-tune under a different msda_window/band)")
    ap.add_argument("--band", default="tile", choices=["tile", "point"],
                    help="train-time band mode when --window > 0")
    ap.add_argument("--window", type=int, default=0,
                    help="training-time msda_window (0 = exact)")
    ap.add_argument("--windows", default="0,16,32",
                    help="sweep-time window list (each = one compile)")
    ap.add_argument("--int8", action="store_true",
                    help="sweep also evaluates int8 and win16+int8 "
                         "variants (two more compiles)")
    ap.add_argument("--train_seconds", type=int, default=3600 * 3,
                    help="post-compile training budget (the clock starts "
                         "at the first completed step)")
    ap.add_argument("--resume", action="store_true",
                    help="train: start from --out/artifact instead of init")
    ap.add_argument("--ckpt_every", type=int, default=500)
    ap.add_argument("--size", type=int, default=600)
    ap.add_argument("--max_size", type=int, default=1000)
    ap.add_argument("--tiny", action="store_true",
                    help="shrunken model + shapes for CPU smoke tests")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from egtr_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    if args.cmd == "train":
        cmd_train(args)
    elif args.cmd == "offsets":
        cmd_offsets(args)
    else:
        cmd_sweep(args)


if __name__ == "__main__":
    main()
