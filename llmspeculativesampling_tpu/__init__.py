"""TPU-native speculative-decoding inference engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference research codebase (see SURVEY.md): 9 decoding algorithms, a
static-shape rollback-capable KV-cache runtime, patched-attention Llama/OPT
model cores, an evaluation harness, and a serving endpoint — rebuilt around
fused jitted decode steps, fixed shapes, explicit PRNG keys, and
mesh-sharded execution.
"""

__version__ = "0.1.0"
