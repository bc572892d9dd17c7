"""surround360_tpu — a TPU-native (JAX/XLA/Pallas) 3D-360 VR capture & render framework.

A ground-up rebuild of the capabilities of facebookarchive/Surround360
(C++/OpenCV/Halide) as one sharded, compiled JAX program:

- ``geometry``  — camera model (FTHETA / RECTILINEAR), rig descriptions
                  (reference: surround360_render/source/render/Camera.{h,cpp}).
- ``ops``       — remap/warp/compositing/filter primitives
                  (reference: source/render/ImageWarper.*, source/util/*).
- ``isp``       — software ISP raw Bayer -> RGB
                  (reference: source/camera_isp/CameraIsp.h, CameraIspGen.cpp).
- ``flow``      — pyramidal patch-match optical flow, TPU-parallel reformulation
                  (reference: source/optical_flow/PixFlow.h).
- ``views``     — flow-based novel-view synthesis
                  (reference: source/optical_flow/NovelView.{h,cpp}).
- ``render``    — stereo equirect/cubemap panorama renderer
                  (reference: source/test/TestRenderStereoPanorama.cpp).
- ``calib``     — geometric / color / vignetting calibration
                  (reference: source/calibration/*).
- ``parallel``  — jax.sharding meshes: camera-pair ring sharding, frame DP.
- ``capture``   — .bin footage format io + capture simulator
                  (reference: source/camera_isp/BinaryFootageFile.*).
- ``cli``       — Python 3 pipeline drivers (reference: scripts/*.py).
"""

__version__ = "0.1.0"
