"""Circuit (AIR) definitions.

Planned families (SURVEY.md §7.2):
- ``toy``: small AIRs exercising the full prover/verifier pipeline.
- ``rv32im``: the zkVM execution circuit (SURVEY.md §2.2, risc0-circuit-rv32im).
- ``keccak``: the Keccak-f accelerator circuit (risc0-circuit-keccak).
"""
