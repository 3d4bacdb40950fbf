from .frame import Frame, LidarScan, ImuBatch, InsFix, pad_points, pad_imu
from .player import FramePlayer, normalize_frame_dict
from .recorder import FrameRecorder
from .pcd import read_pcd, write_pcd
from .gpchc import parse_gpchc, format_gpchc
