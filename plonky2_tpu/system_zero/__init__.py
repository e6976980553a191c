"""System Zero — a zkVM-style STARK over the shared field+FRI stack
(reference system_zero/src/)."""
