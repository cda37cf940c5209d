"""Host-quietness probe (BASELINE.md methodology): a fixed single-process
numpy matmul control. Quiet host ≈ its recorded reference time; a steal
wave inflates it 5-70x. Run before any bench/scaling measurement and
only record numbers when this is at parity.

Reference on this host (quiet): ~3.4 s (3x 2000^3 float64 matmul;
OMP_NUM_THREADS=1 in this environment, ~12.6 GFLOP/s single core).
Prints seconds and a QUIET/NOISY verdict.
"""

import time

import numpy as np

QUIET_REF = 3.4
NOISY_FACTOR = 2.0

rng = np.random.default_rng(0)
a = rng.random((2000, 2000))
t0 = time.perf_counter()
for _ in range(3):
    a @ a
dt = time.perf_counter() - t0
verdict = "QUIET" if dt < QUIET_REF * NOISY_FACTOR else "NOISY"
print(f"{dt:.2f} s ({verdict}; quiet ref ~{QUIET_REF} s)")
