"""directtrajopt_tpu — TPU-native direct trajectory optimization.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
harmoniqs/DirectTrajOpt.jl: direct transcription of optimal-control problems
(bilinear / derivative / time-dependent dynamics, composable objectives, a
full linear + nonlinear constraint stack) solved by an on-device batched
primal-dual interior-point method with block-structured KKT factorization,
vmapped over scenario batches and shardable over device meshes.
"""

from .module import HashableArray, module, static_field
from .trajectory import Layout, Trajectory, traj_index, traj_slice

__version__ = "0.1.0"
