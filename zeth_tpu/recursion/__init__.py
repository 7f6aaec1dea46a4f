"""Segment aggregation: the lift/join tree scheduler.

Maps the reference's recursion pipeline (SURVEY.md §2.2,
risc0-circuit-recursion: lift each rv32im segment receipt to a succinct
receipt, join pairs until one remains, resolve accelerator assumptions)
onto a host-level DAG scheduler that dispatches independent prove tasks
across devices/hosts (§2.3 "segment parallelism" axis).

v1 state: the DAG scheduler, task retry/idempotency, and the aggregated
"rollup receipt" (join nodes bind child claims with Poseidon2, producing
one root claim per execution) are implemented. The *in-circuit* verifier
(proving each join cryptographically, so the root seal alone attests the
whole chain) is the recursion circuit tracked for a later round — until
then the rollup receipt carries the per-segment seals and verification
replays them all.
"""

from .scheduler import JoinTree, ProveTask, aggregate_segments  # noqa: F401
