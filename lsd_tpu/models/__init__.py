from .vfe import MeanVFE, PillarVFE, scatter_to_bev
from .bev_backbone import BEVBackbone
from .center_head import CenterHead, decode_boxes
from .detector import CenterPointDetector, DetectorConfig, detection_loss, make_target_maps
from .mono3d import Mono3D, Mono3DConfig, decode_mono3d, mono3d_loss, make_mono3d_targets
