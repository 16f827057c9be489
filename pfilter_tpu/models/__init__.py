"""SLAM pipelines assembled from pfilter_tpu.ops kernels."""
