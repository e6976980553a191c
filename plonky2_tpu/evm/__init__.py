"""Multi-table STARK prover with cross-table lookups — the EVM prover's
architecture (reference evm/src/).  This package carries the table-generic
machinery (CTLs, shared-challenger multi-prove, aggregate verification) plus
the first table family; further EVM tables (cpu, keccak, keccak_sponge,
arithmetic) layer on top."""
