"""OnePose++ TPU: a TPU-native (JAX/XLA/Pallas) one-shot object pose estimation framework.

Re-designed from scratch with the capabilities of zju3dv/OnePose_Plus_Plus
(keypoint-free one-shot object pose estimation without CAD models, NeurIPS 2022):

- ``models``   : Flax ResNet-FPN + LoFTR-style linear-attention transformers; the
                 image<->image LoFTR matcher and the 2D<->3D OnePose++ matcher.
- ``ops``      : TPU compute primitives (linear attention, dual-softmax matching,
                 window gathers, soft-argmax) with Pallas fused variants.
- ``geometry`` : SO(3)/SE(3), projection, multi-view DLT triangulation, epipolar
                 verification, batched RANSAC-PnP and Levenberg-Marquardt solvers.
- ``sfm``      : the keypoint-free structure-from-motion engine (replaces
                 COLMAP/DeepLM with vmapped JAX geometry).
- ``data``     : datasets and host-side IO (images, COLMAP models, annotations).
- ``train``    : losses, optimizer/schedule, data-parallel train step over a Mesh.
- ``inference``: batched query pose pipeline + local-feature object detector.
- ``parallel`` : device-mesh helpers (pjit/shard_map data parallelism over ICI).

All device code keeps static shapes (fixed-capacity match slots with validity
masks) so XLA can tile onto the MXU; variable-size work lives on the host.
"""

__version__ = "0.1.0"
