"""video_similarity_search_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
self-supervised video similarity learning and retrieval.

Re-implements, TPU-first, the full capability surface of the SLIC reference
(rvl-lab-utoronto/video_similarity_search): 3D-CNN video encoders (3D-ResNet,
S3D/S3D-G, R3D, SlowFast), triplet/NCE contrastive training with iterative
clustering (FINCH / k-means) pseudo-labels, and cosine-kNN video retrieval,
plus linear-probe / finetune classification.

Design notes (vs the reference):
  * compute path is JAX: models are flax.linen modules in channels-last
    (B, T, H, W, C) layout so XLA tiles 3-D convs onto the MXU;
  * hot similarity ops (pairwise distance, top-k retrieval, 1-NN, segment
    means) are Pallas TPU kernels with jnp fallbacks (ops/);
  * data parallelism is a jax.sharding.Mesh + shard_map/pjit over a 1-D
    "data" axis — not process-per-GPU DDP; gradient sync is a pmean inside
    the jitted train step; cross-replica BatchNorm is a pmean of batch
    statistics (reference: torch SyncBatchNorm);
  * memory banks (NCE per-sample banks, MoCo queue, triplet FIFO bank) are
    explicit device arrays threaded through the train state.
"""

__version__ = "0.1.0"
