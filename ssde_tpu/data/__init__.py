from .splits import readlines, split_file
from .kitti import (
    KITTIDataset,
    KITTIRAWDataset,
    KITTIOdomDataset,
    KITTIDepthDataset,
)
from .sequence import (
    KITTISeqDataset,
    KITTIImagePairDataset,
    KITTISceneDataset,
    generate_frame_tuples,
    count_scene_frames,
)
from .transforms import (
    color_jitter,
    build_pyramid,
    scale_intrinsics,
    preprocess_batch,
)
from .pipeline import Loader
from .synthetic import SyntheticKittiDataset, make_synthetic_batch
