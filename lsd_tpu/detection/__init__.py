from .post import PostProcessConfig, postprocess
from .tracker import Tracker3D, TrackerConfig
from .object_filter import ObjectFilter
from .fusion import FrameFusion
from .camera_fusion import fuse_camera_lidar, project_box_to_image
