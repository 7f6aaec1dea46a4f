"""STARK proving engine: DEEP-ALI + FRI over Baby Bear.

TPU-native replacement for the STARK core of risc0-zkp 3.0.2 (SURVEY.md
§2.2): prover math runs as batched JAX/XLA device programs, the verifier
and Fiat-Shamir transcript run in portable host numpy. See PROTOCOL.md
for the full protocol specification.
"""

from .transcript import Transcript  # noqa: F401
from .air import Air  # noqa: F401
