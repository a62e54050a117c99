"""diffsg_tpu — TPU-native diffusion solution generators for network optimization.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference DiffSG repo (qiyu3816/DiffSG): classifier-free-guidance DDPMs whose
reverse process generates solutions for MSR / CO / NU network-optimization
problems, plus baselines (GD, MTFNN, PPO, GEKKO oracle), dataset generators,
and trajectory tooling.
"""

__version__ = "0.1.0"
