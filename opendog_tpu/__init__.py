"""opendog_tpu — a TPU-native quadruped simulation, MPC and RL framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
cruzryan/OpenDOG reference stack: analytic rigid-body physics with soft
contact, batched task environments and reward libraries, MPPI / iLQR
trajectory-optimization solvers at a 50 Hz control budget, PPO training,
sim-to-real gait export, and a quadpilot-compatible robot SDK backed by a C++
firmware simulator.
"""

__version__ = "0.1.0"
