"""beam_slam_tpu — TPU-native SLAM framework (beam_slam parity rebuild).

Numerical policy: every matmul in this package is part of an estimation
problem (normal equations, Schur complements, Lie-group chains, point-cloud
registration), so the TPU MXU's default bf16 input truncation is NOT
acceptable: with the default precision a single flagship LM solve lands
~1 cm away from the f32 CPU result (measured round 3 — enough to corrupt
scan-to-map seeds and compound into metre-level session drift), while
"high" (bf16x3 passes) matches the f32 CPU result to 2e-5 m and "highest"
(bf16x6) to 1e-5 m. Measured flagship cycle cost: default 9.0 ms / high
11.5 ms / highest 14.3 ms — "high" buys back most of the speed at f32-level
accuracy, so it is the package default. The reference runs Ceres in f64
(fixed_lag_smoother.cpp); f32-high is our equivalent floor.

Throughput-only kernels that can tolerate bf16 (descriptor matching, kNN
distance matrices) may locally opt back down with
``jax.default_matmul_precision("default")``.
"""

import jax as _jax

_jax.config.update("jax_default_matmul_precision", "high")
