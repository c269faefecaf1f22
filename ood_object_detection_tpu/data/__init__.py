from .dataset import (
    DetectionDataset,
    PrefetchLoader,
    SkipSubset,
    SyntheticDetectionDataset,
    collate_batch,
    create_loader,
    pad_annotations,
)
from .dataset_factory import create_dataset
from .device_preproc import batched_letterbox_normalize, normalize_uint8
from .input_config import resolve_input_config
from .parsers import (
    CocoParser,
    OpenImagesParser,
    Parser,
    ParserConfig,
    VocParser,
    create_parser,
)
from .transforms import (
    Compose,
    ImageToNumpy,
    ProjResizePad,
    RandomFlip,
    RandomResizePad,
    ResizePad,
    clip_boxes_,
    transforms_coco_eval,
    transforms_coco_train,
    transforms_projection,
)
from .episodic import EpisodeBuilder, EpisodicDataset, SyntheticEpisodeSource
from .metadata import (
    build_category_pools,
    directory_support_source,
    load_annotation_index,
    load_category_counts,
    load_metadata_dicts,
    split_train_val_cats,
)
from .native_decode import (
    NativeEvalLoader,
    available as native_decode_available,
    decode_jpeg,
    load_letterbox_batch,
)
from .random_erasing import random_erasing
from .pretrain_stream import (
    ParserQuerySource,
    PretrainEpisodeStream,
    split_categories_by_count,
)
