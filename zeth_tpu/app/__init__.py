"""zeth application layer: Ethereum stateless validation on the framework.

Mirrors the reference's app stack (SURVEY.md §1 L2-L5):
- ``trie``:      sparse Merkle-Patricia trie from witness RLP nodes
                 (risc0-ethereum-trie + zeth-core SparseState role)
- ``rlp``:       minimal RLP encode/decode
- ``chainspec``: guest-friendly hardfork tables (crates/chainspec)
- ``host``:      BlockProcessor - cache/validate/prove orchestration
                 (crates/host)
- ``cli``:       the end-user command line (crates/host/src/bin/cli.rs)
"""
