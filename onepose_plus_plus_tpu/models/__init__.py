from .backbone import ResNetFPN_8_2
from .position_encoding import sine_position_encoding, KeypointEncoder
from .transformer import LoFTREncoderLayer, LocalFeatureTransformer
from .onepose_plus import OnePosePlusModel
from .loftr import LoFTRMatcher
