"""Dataset loaders: TUM RGB-D, KITTI odometry, EuRoC MAV.

Mirror the reference's example-driver loaders (reference:
Examples/Monocular/mono_tum.cc:LoadImages, Examples/Stereo/
stereo_kitti.cc:130-164, Examples/Stereo/stereo_euroc.cc, Examples/RGB-D/
rgbd_tum.cc associations loader) as plain-Python path+timestamp indexers;
frame decode goes through the native prefetcher (io/native)."""

from c_orb_slam_tpu.datasets.euroc import load_euroc  # noqa: F401
from c_orb_slam_tpu.datasets.kitti import load_kitti  # noqa: F401
from c_orb_slam_tpu.datasets.tum import load_tum_associations, load_tum_rgb  # noqa: F401
