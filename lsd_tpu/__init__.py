"""lsd_tpu — TPU-native LiDAR SLAM & perception framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``w111liang222/lidar-slam-detection`` (the "reference"): multi-sensor
ingest + record/replay, FAST-LIO-style tightly-coupled LiDAR-inertial
odometry, pose-graph optimization, map persistence and map-based
localization (NDT + UKF + ScanContext reloc), and a BEV voxel-CNN 3D
detection + 3D MOT stack.

Layout (mirrors SURVEY.md §2 component inventory):

- ``lsd_tpu.geometry``  — SO3/SE3 manifold ops, UTM projector (ref: sensor_driver/common_lib/cpp_utils)
- ``lsd_tpu.ops``       — Pallas/JAX kernels: voxelization, voxel hash map,
                          kNN/plane fit, rotated IoU/NMS (ref: sensor_driver/inference)
- ``lsd_tpu.slam``      — ESIKF LIO, keyframes, pose graph, ScanContext,
                          NDT, UKF localization, map IO (ref: slam/)
- ``lsd_tpu.detection`` — detection post-processing + MOT tracker
                          (ref: sensor_inference/, sensor_fusion/)
- ``lsd_tpu.models``    — flax model zoo: pillar/voxel encoders, BEV
                          backbone, CenterPoint heads (ref: sensor_inference/pytorch_model)
- ``lsd_tpu.parallel``  — device mesh helpers, sharded/distributed PGO
- ``lsd_tpu.runtime``   — module pipeline, config manager, sources/sinks
                          (ref: module/)
- ``lsd_tpu.io``        — frame schema, pkl record/replay, PCD, GPCHC
- ``lsd_tpu.utils``     — logging, metrics, timing
"""

__version__ = "0.1.0"
