"""pfilter_tpu — a TPU-native LiDAR SLAM engine with the capabilities of PFilter.

A brand-new JAX/XLA/Pallas implementation of persistence-filtered LiDAR
odometry/SLAM (PFilter, IROS 2022).  The reference system
(kevrenhype/PFilter-noetic) is a C++/ROS/PCL/Ceres node pipeline; this package
re-designs every component TPU-first:

- feature extraction as vectorized per-ring kernels (ref: src/laserProcessingClass.cpp)
- KdTreeFLANN/VoxelGrid/CropBox replaced by sorted voxel-grid gather kernels
  (ref: src/odomEstimationClass.cpp:34-134 ``rgbds``)
- Ceres replaced by batched analytic Gauss-Newton on SE(3)
  (ref: src/lidarOptimization.cpp)
- the ROS node graph replaced by a jit-compiled dataflow over device meshes
  (ref: src/*Node.cpp)

Subpackages:
  ops       pure compute kernels (se3, features, voxel, knn, gauss_newton, ...)
  models    SLAM pipelines assembled from ops (ES, BPF, visualization map)
  parallel  device-mesh sharding of the map + distributed GN reduction
  utils     IO (KITTI/synthetic), metrics, config, checkpointing, profiling
"""

__version__ = "0.1.0"

from pfilter_tpu.config import (  # noqa: F401
    CapacityConfig,
    FeatureConfig,
    LidarConfig,
    OdometryConfig,
    PipelineConfig,
)
