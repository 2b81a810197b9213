"""Worker for the two-process FULL-DRIVER test (test_multiprocess.py).

Run as:  python tests/mp_driver_worker.py <process_id> <port> <data_root> <out>

Where mp_worker.py validates the distributed primitives one at a time,
this runs the ENTIRE ``driver.train`` loop with ``jax.process_count() == 2``
actually true: per-host loader construction through ``make_train_loader``
(BATCH_SIZE/nproc division), two ``--iterative_cluster`` epochs including
the post-cluster pseudo-label loader REBUILD on BOTH hosts (the round-3
multi-host bug site, driver.py make_train_loader), in-memory cluster
labels on the non-master host (it must not depend on reading the
master-written vid_clusters.txt back), master-gated checkpoint/log
writes, sharded validation and the epoch-0 retrieval eval.

Prints ``MPCHECK <json>`` lines the parent compares across processes:
final params must be BIT-identical (same global gradient collectives on
both hosts), cluster NMI identical, and only the master may have written
checkpoints/logs.
"""

import argparse as _argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid, port = int(sys.argv[1]), int(sys.argv[2])
    data_root, out_dir = sys.argv[3], sys.argv[4]
    # 'perproc' (default): per-process out dirs — master-gating is
    # assertable. 'shared': ONE out dir for both hosts (the realistic
    # shared-filesystem deployment) — exercises the all-host orbax save
    # into one path AND a cross-process orbax RESTORE afterwards.
    mode = sys.argv[5] if len(sys.argv) > 5 else "perproc"

    import jax

    from video_similarity_search_tpu.parallel import initialize_distributed

    initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()

    import numpy as np

    from video_similarity_search_tpu.config import get_cfg
    from video_similarity_search_tpu.train.driver import train

    def emit(name, value):
        print(f"MPCHECK {json.dumps({'p': pid, 'check': name, 'v': value})}",
              flush=True)

    cfg = get_cfg()
    cfg.MODEL.ARCH = "3dresnet"
    cfg.RESNET.MODEL_DEPTH = 10
    cfg.RESNET.NO_MAX_POOl = True
    cfg.RESNET.HIDDEN_LAYER = 64
    cfg.RESNET.OUT_DIM = 16
    cfg.DATA.SAMPLE_DURATION = 4
    cfg.DATA.SAMPLE_SIZE = 16
    cfg.TRAIN.BATCH_SIZE = 8  # global; 4 per host
    cfg.TRAIN.EPOCHS = 2
    cfg.TRAIN.NUM_DATA_WORKERS = 1
    cfg.TRAIN.LOG_INTERVAL = 100
    cfg.VAL.BATCH_SIZE = 8
    cfg.DATASET.VID_PATH = os.path.join(data_root, "jpg")
    cfg.DATASET.ANNOTATION_PATH = os.path.join(data_root, "annotation.json")
    cfg.DATASET.SAMPLING_STRATEGY = "random_semi_hard"
    cfg.DATASET.POSITIVE_SAMPLING_P = 1.0
    cfg.ITERCLUSTER.METHOD = "finch"
    cfg.ITERCLUSTER.INTERVAL = 1
    cfg.ITERCLUSTER.WARMUP_EPOCHS = 0
    cfg.ITERCLUSTER.ADAPTIVEP = True
    cfg.OPTIM.LR = 0.01
    # per-process output dir (local-scratch layout): master-gating is then
    # assertable — ONLY process 0's dir may gain checkpoints/logs, and the
    # non-master host must finish the rebuild epochs WITHOUT ever reading
    # a vid_clusters.txt back (in-memory labels)
    if mode == "perproc":
        out_dir = os.path.join(out_dir, f"p{pid}")
    cfg.OUTPUT_PATH = out_dir
    cfg.TPU.COMPUTE_DTYPE = "float32"
    os.makedirs(out_dir, exist_ok=True)

    args = _argparse.Namespace(checkpoint_path=None, start_epoch=None,
                               iterative_cluster=True, vector=False)
    state = train(args, cfg)

    emit("final_step", int(np.asarray(state.step)))
    # params replicated over the global mesh must be bit-identical across
    # hosts: hash the host-local copy
    leaves = jax.tree_util.tree_leaves(state.params)
    h = hashlib.sha256()
    for leaf in leaves:
        h.update(np.asarray(leaf).tobytes())
    emit("params_hash", h.hexdigest()[:16])
    # master-gating: only process 0 writes logs/checkpoints
    logs = os.path.join(out_dir, "tnet_checkpoints")
    emit("wrote_cluster_file",
         os.path.exists(os.path.join(out_dir, "vid_clusters.txt")))
    emit("wrote_train_log",
         os.path.exists(os.path.join(logs, "train_loss_and_acc.txt")))
    nmi_path = os.path.join(logs, "NMIs.txt")
    emit("nmis", open(nmi_path).read() if os.path.exists(nmi_path) else "")

    if mode == "shared":
        # cross-process orbax RESTORE from the shared checkpoint: every
        # host must call it (restore barriers like save); the restored
        # payload must carry the final epoch and BIT-identical params
        from video_similarity_search_tpu.train.checkpoint import \
            load_checkpoint
        from video_similarity_search_tpu.train.driver import \
            _resolve_checkpoint

        ckpt = _resolve_checkpoint(out_dir, cfg.MODEL.ARCH)
        payload = load_checkpoint(ckpt)
        emit("restored_epoch", int(payload["epoch"]))
        rh = hashlib.sha256()
        for leaf in jax.tree_util.tree_leaves(payload["params"]):
            rh.update(np.asarray(leaf).tobytes())
        emit("restored_params_hash", rh.hexdigest()[:16])

    emit("done", True)


if __name__ == "__main__":
    main()
