"""Determine pltpu.bitcast's uint32->bf16 sublane packing layout.

pltpu.bitcast(x_u32 [S, L], bf16) -> [2S, L]. Two hypotheses for where
input row s's low/high 16-bit halves land:
  A (interleaved): low -> 2s, high -> 2s+1
  B (blocked):     low -> s,  high -> S+s
This feeds the v1_pair scorer variant (two bit planes extracted per
shift+and, landing in the two bf16 halves of each uint32).

Run alone on the TPU:
    env -u JAX_PLATFORMS python scripts/probe_bitcast_layout.py
"""
import sys

import numpy as np

sys.path.insert(0, ".")

from vsearch_tpu.utils.claim_guard import register_tpu_process

register_tpu_process("probe_layout")
from vsearch_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

S, L = 8, 128


def kernel(x_ref, o_ref):
    o_ref[:] = pltpu.bitcast(x_ref[:], jnp.bfloat16)


def main():
    # distinct bf16 patterns in the two halves: low half = 1.0 + s/256
    # (varies by row), high half = 2.0 + s/256
    lo = np.zeros((S, L), np.uint32)
    hi = np.zeros((S, L), np.uint32)
    for s in range(S):
        lo[s, :] = np.frombuffer(
            np.array(1.0 + s / 256, np.float32).tobytes(), np.uint32
        )[0] >> 16  # bf16 bits of 1.0+s/256
        hi[s, :] = np.frombuffer(
            np.array(2.0 + s / 256, np.float32).tobytes(), np.uint32
        )[0] >> 16
    x = (hi << 16) | lo

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2 * S, L), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = np.asarray(f(jnp.asarray(x)))[:, 0]
    print("out rows (lane 0):", [round(float(v), 4) for v in out])
    interleaved = all(
        abs(float(out[2 * s]) - (1.0 + s / 256)) < 1e-2
        and abs(float(out[2 * s + 1]) - (2.0 + s / 256)) < 1e-2
        for s in range(S))
    blocked = all(
        abs(float(out[s]) - (1.0 + s / 256)) < 1e-2
        and abs(float(out[S + s]) - (2.0 + s / 256)) < 1e-2
        for s in range(S))
    print(f"interleaved(A)={interleaved} blocked(B)={blocked}")


if __name__ == "__main__":
    main()
