from .colmap_model import (
    Camera,
    Image,
    Point3D,
    read_model,
    write_model,
    detect_model_format,
    model_stats,
)
from .image_io import (
    imread_gray,
    imread_color,
    resize_image,
    load_gray_resize_divisible,
    pad_to_shape,
    save_h5,
    load_h5,
    grouped_save_h5,
    grouped_load_h5,
)
from .preprocessing import (
    square_bbox,
    crop_img_by_bbox,
    pad_point_cloud,
    save_3d_annotation,
    load_3d_annotation,
    save_2d_annotation,
    load_2d_annotation,
)
from .homography import sample_homography, warp_image, warp_points
from .dataset import (
    FrameRecord,
    load_manifest,
    records_from_coco,
    OnePosePlusTrainDataset,
    OnePosePlusInferenceDataset,
    TrainLoader,
    batch_examples,
)
from .augment import build_augmentor, DarkAug, MobileAug
from .colmap_database import (
    COLMAPDatabase,
    export_scene_to_database,
    pair_id_from_image_ids,
    image_ids_from_pair_id,
)
