from .config_loader import Config, load_config, save_config
from .profiling import (
    PassThroughProfiler,
    SimpleProfiler,
    build_profiler,
    trace,
    annotate,
)
from .checkpoint import (
    save_checkpoint,
    load_checkpoint,
    convert_torch_state_dict,
    load_torch_checkpoint,
)
from .visualization import (
    project_box_corners,
    draw_3d_box,
    save_demo_frame,
    make_video,
    save_ply,
)
from .plotting import (
    plot_matches_on_image,
    plot_reprojection_comparison,
    plot_image_pair_matches,
    figure_to_array,
)
from .template_utils import format_config, print_config, flatten_config, log_hparams
