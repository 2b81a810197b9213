from .checkpoint import (load_checkpoint, load_torch_checkpoint,
                         merge_pretrained, restore_train_state,
                         save_checkpoint, torch_linear_classifier_to_flax,
                         torch_moco_encoder_to_flax, torch_r3d_to_flax,
                         torch_resnet3d_to_flax, torch_s3d_to_flax,
                         torch_slowfast_to_flax, torch_to_flax)
from .state import TrainState, create_train_state, make_optimizer
from .steps import (diff_view, make_classify_train_step,
                    make_contrastive_train_step, make_embed_step,
                    make_moco_train_step, make_triplet_train_step,
                    shuffle_view)

__all__ = [
    "TrainState", "create_train_state", "diff_view", "load_checkpoint",
    "load_torch_checkpoint", "make_classify_train_step",
    "make_contrastive_train_step", "make_embed_step", "make_moco_train_step",
    "make_optimizer", "make_triplet_train_step", "merge_pretrained",
    "restore_train_state", "save_checkpoint", "shuffle_view",
    "torch_resnet3d_to_flax",
]
