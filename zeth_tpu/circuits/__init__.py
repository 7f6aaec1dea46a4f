"""Circuit (AIR) definitions.

Planned families (SURVEY.md §7.2):
- ``toy``: small AIRs exercising the full prover/verifier pipeline.
- ``rv32im``: the zkVM execution circuit (SURVEY.md §2.2, risc0-circuit-rv32im).
- ``keccak``: the Keccak-f accelerator circuit (risc0-circuit-keccak).
- ``paging``: the memory page-tree companion circuit (the reference's
  in-trace paging argument, refactored as a dense periodic AIR).
- ``bigint2`` / ``sha256``: accelerator circuits.
"""
