from .attention import linear_attention, full_attention
from .upsample import upsample2x_align_corners
from .window_gather import gather_windows
from .soft_argmax import spatial_expectation_2d, heatmap_std
from .matching import dual_softmax_confidence, select_topk_matches
from .matching import CoarseMatches, pad_matches_with_gt
from .pallas_matching import dual_softmax_rowcol_stats, fused_select_topk_matches
