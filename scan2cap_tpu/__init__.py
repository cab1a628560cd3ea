"""scan2cap_tpu — a TPU-native 3D dense-captioning framework (JAX / XLA / Pallas / pjit).

Built from scratch with the capabilities of Scan2Cap (daveredrum/Scan2Cap): detect
objects in a ScanNet point cloud and generate a natural-language description per box.

Layout conventions (differ from the PyTorch reference on purpose):
  * all point features are channels-LAST ``(B, N, C)`` — the feature axis maps to
    TPU lanes and 1x1 convs become plain matmuls on the MXU;
  * every shape is static (N points, K proposals, T caption steps are config
    constants) so the whole pipeline compiles to a single XLA program;
  * the "data_dict" API of the reference is kept as a flat dict-of-arrays pytree.
"""

__version__ = "0.1.0"
