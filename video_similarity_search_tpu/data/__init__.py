from .augment import normalize_only, normalization_constants, train_augment
from .datasets import ClipReader, TripletsDataset, VideoDataset
from .loaders import (BinaryImageLoaderPIL, ImageLoaderPIL, VideoLoader,
                      VideoLoaderFlowHDF5, VideoLoaderHDF5)
from .lmdb_data import (DictReader, HMDB51Flow_LMDB, HMDB51LMDB, LMDBReader,
                        K400_Flow_LMDB_2CLIP, K400_LMDB_2CLIP,
                        K400_2STREAM_LMDB_2CLIP, UCF101Flow_LMDB,
                        UCF101Flow_LMDB_2CLIP, UCF101LMDB, UCF101LMDB_2CLIP,
                        UCF101_2STREAM_LMDB_2CLIP, get_lmdb_dataset)
from .manifests import (get_manifest, load_kinetics_manifest,
                        load_video_manifest, read_cluster_labels,
                        write_cluster_labels)
from .pipeline import (PrefetchLoader, build_data_loader,
                       build_temporal_transforms, collate_triplets,
                       collate_videos, get_channel_extension)

__all__ = [
    "BinaryImageLoaderPIL", "ClipReader", "DictReader", "HMDB51Flow_LMDB",
    "HMDB51LMDB", "ImageLoaderPIL", "K400_2STREAM_LMDB_2CLIP",
    "K400_Flow_LMDB_2CLIP", "K400_LMDB_2CLIP", "LMDBReader",
    "PrefetchLoader", "TripletsDataset", "UCF101Flow_LMDB",
    "UCF101Flow_LMDB_2CLIP", "UCF101LMDB", "UCF101LMDB_2CLIP",
    "UCF101_2STREAM_LMDB_2CLIP", "VideoDataset", "VideoLoader",
    "VideoLoaderFlowHDF5", "VideoLoaderHDF5", "build_data_loader",
    "build_temporal_transforms", "collate_triplets", "collate_videos",
    "get_channel_extension", "get_lmdb_dataset", "get_manifest",
    "load_kinetics_manifest", "load_video_manifest",
    "normalization_constants", "normalize_only", "read_cluster_labels",
    "train_augment", "write_cluster_labels",
]
