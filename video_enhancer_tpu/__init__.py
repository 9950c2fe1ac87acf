"""video_enhancer_tpu — a TPU-native video enhancement framework.

Built from scratch in JAX/XLA/Pallas/pjit with the capabilities of the
reference platform ``mindburnlabs/video-enhancer-proto`` (see SURVEY.md):
degradation-analysis routing across four neural restoration families
(VSRM, SeedVR2, DiTVR, FastMambaVSR) plus pre/post experts, exposed
through a REST job API and a programmatic pipeline.

Layout
------
- ``config``   typed configuration tree + routing policy (actually loaded)
- ``ops``      Pallas kernels + XLA primitives (scan, attention, resize, ...)
- ``nn``       minimal functional layer library (param pytrees, init/apply)
- ``models``   model definitions (pure functions over pytrees)
- ``analysis`` degradation analysis + routing (jitted scoring graphs)
- ``io``       host-side video decode/encode + device feed pipeline
- ``parallel`` mesh construction, shardings, collectives, halo exchange
- ``runtime``  handlers, job store, perf tracking, recovery
- ``agents``   task orchestration layer
- ``serving``  REST API surface (stdlib HTTP, no external framework)
- ``train``    losses, optimizer, sharded train step
"""

__version__ = "0.1.0"
