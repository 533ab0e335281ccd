from .pipeline import InferenceResult, make_query_step, run_inference
from .detector import LocalFeatureObjectDetector, ransac_affine
