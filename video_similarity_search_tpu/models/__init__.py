from .heads import LinearClassifier, R3DEmbedder, S3DEmbedder
from .moco import (MoCoEncoder, MoCoState, dequeue_and_enqueue,
                   infonce_forward, init_moco_state, momentum_update,
                   ubernce_forward)
from .r3d import R3DNet
from .registry import ARCHES, model_selector
from .resnet3d import ResNet3D, backbone_feature_dim, generate_model
from .s3d import S3D, select_backbone
from .slowfast import SinglePathwayResNet, SlowFast, multipathway_input
from .triplet_net import TripletNet, pairwise_dist

__all__ = [
    "ARCHES", "LinearClassifier", "MoCoEncoder", "MoCoState", "R3DEmbedder",
    "R3DNet", "ResNet3D", "S3D", "S3DEmbedder", "SinglePathwayResNet",
    "SlowFast", "TripletNet", "backbone_feature_dim", "dequeue_and_enqueue",
    "generate_model", "infonce_forward", "init_moco_state", "model_selector",
    "momentum_update", "multipathway_input", "pairwise_dist", "select_backbone",
    "ubernce_forward",
]
