"""snag_tpu — a TPU-native multi-modal knowledge-graph representation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of zjukg/SNAG
("The Power of Noise: Toward a Unified Multi-modal Knowledge Graph
Representation Framework", COLING 2024):

* MMEA — multi-modal entity alignment (SNAG / MEAformer / MCLEA / EVA / MSNEA
  model families as configs over one composable pipeline).
* MKGC — multi-modal knowledge-graph completion (margin-ranking link
  prediction with Mformer fusion variants).

Design stance (vs. the PyTorch reference at /root/reference):
* one jitted full-graph training step per epoch iteration — the workload is
  "encode all entities, contrast a batch", a natural single XLA computation;
* sparse graph ops are sorted-edge-list ``segment_sum`` formulations (XLA has
  no sparse tensors); the modality-token fusion transformer and the B×B
  contrastive loss have Pallas kernel fast paths;
* all state transitions (noise resampling, pseudo-label mining, train-set
  growth) are functional and fixed-shape: capacity-padded buffers + masks
  instead of Python-side rebuilds, so nothing recompiles mid-run;
* scaling is SPMD over a ``jax.sharding.Mesh`` (entity axis + batch axis),
  not a torch.distributed translation.
"""

__version__ = "0.1.0"

from snag_tpu.config import Config, build_argparser, finalize_config  # noqa: F401
