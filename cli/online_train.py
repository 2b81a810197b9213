#!/usr/bin/env python
"""Self-supervised pretrain entry point (reference online_train.py:779-837).

Same CLI surface:
    python cli/online_train.py --cfg configs/resnet_ucf_itercluster_flow.yaml \
        --gpu 0,1 --batch_size 32 --output /path/out --iterative_cluster

On TPU there is no process-per-GPU spawn: one process per host drives all
local chips through the jitted, mesh-sharded train step
(``jax.distributed.initialize`` handles multi-host; ``--gpu`` is accepted
and ignored).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_similarity_search_tpu.utils.compile_cache import \
    enable_compile_cache

enable_compile_cache()

from video_similarity_search_tpu.config import arg_parser, load_config
from video_similarity_search_tpu.parallel import (initialize_distributed,
                                                  maybe_auto_initialize)
from video_similarity_search_tpu.train.driver import train


def main():
    args = arg_parser().parse_args()
    cfg = load_config(args)
    if args.compute_canada:
        # node id from the SLURM environment (reference online_train.py:
        # 806-812 reads $SLURM_NODEID under --compute_canada)
        args.shard_id = int(os.environ.get("SLURM_NODEID", args.shard_id))
    if args.num_shards > 1:
        initialize_distributed(args.ip_address_port.replace("tcp://", ""),
                               args.num_shards, args.shard_id)
    else:
        # per-host launch on a multi-host TPU slice without explicit
        # --num_shards: pick topology up from the TPU env (otherwise each
        # host would silently run an isolated copy of the whole job)
        maybe_auto_initialize()
    os.makedirs(cfg.OUTPUT_PATH, exist_ok=True)
    os.makedirs(os.path.join(cfg.OUTPUT_PATH, "tnet_checkpoints"),
                exist_ok=True)
    train(args, cfg)


if __name__ == "__main__":
    main()
