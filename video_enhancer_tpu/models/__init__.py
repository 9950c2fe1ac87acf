"""Model zoo: pure init/apply functions over param pytrees.

Families (mirroring the reference's capability set, SURVEY.md §2.3):
  upscaler        CNN 2x + bicubic fallback  (reference app.py:269-311)
  fast_mamba_vsr  selective-scan VSR          (reference fast_mamba_vsr_handler.py)
  vsrm            Mamba VSR w/ alignment      (reference vsrm_handler.py)
  ditvr           zero-shot video DiT         (reference ditvr_handler.py)
  seedvr2         one-step diffusion restorer (reference seedvr2_handler.py)
  rvrt            windowed-attention fallback (reference rvrt_network.py)
  realesrgan      RRDB frame SR               (reference realesrgan_handler.py)
  rife            frame interpolation         (reference rife_handler.py)
"""
