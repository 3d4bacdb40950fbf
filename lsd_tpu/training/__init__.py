from .data import LabeledFrameDataset, SyntheticDetectionDataset
from .trainer import Trainer, TrainerConfig
