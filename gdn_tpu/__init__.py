"""gdn-tpu: a TPU-native guided depth-estimation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
tjqansthd/GDN-Pytorch (see SURVEY.md): a stage-1 depth-to-depth
autoencoder (D-net) whose depth-domain features guide a stage-2
RGB-to-depth encoder-decoder (G-net), trained and evaluated on
KITTI / NYU Depth v2 with the standard Eigen protocol.
"""

from gdn_tpu import config, losses, metrics

__version__ = "0.1.0"
