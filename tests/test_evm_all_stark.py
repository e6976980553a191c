"""Full multi-table proof: keccak-f + sponge + logic + memory with live
cross-table lookups, proven and verified end-to-end
(reference evm/src/all_stark.rs — whose CTLs are disabled; ours are live)."""
import numpy as np
import pytest

from plonky2_tpu.evm import all_stark as ast
from plonky2_tpu.evm import keccak_sponge as sponge_mod
from plonky2_tpu.evm.keccak_sponge import KeccakSpongeOp
from plonky2_tpu.evm.prover import prove_all
from plonky2_tpu.evm.verifier import verify_all_proof
from plonky2_tpu.hash.keccak import keccak256
from plonky2_tpu.stark.config import StarkConfig


def sponge_ops():
    return [KeccakSpongeOp(0, 2, 0, 1, bytes(range(136)) + b"tail"),
            KeccakSpongeOp(0, 2, 1024, 7, b"plonky2 on tpu")]


@pytest.fixture(scope="module")
def all_proof_setup():
    all_stark = ast.make_all_stark()
    traces = ast.generate_all_traces(sponge_ops())
    config = StarkConfig.standard_fast_config()
    proof = prove_all(all_stark, config, traces)
    return all_stark, traces, config, proof


def test_traces_are_consistent(all_proof_setup):
    _, traces, _, _ = all_proof_setup
    sponge_trace = traces[ast.KECCAK_SPONGE]
    finals = np.nonzero(sponge_trace[sponge_mod.IS_FINAL_BLOCK])[0]
    stark = ast.KeccakSpongeStark()
    digests = [stark.digest(sponge_trace, int(j)) for j in finals]
    assert digests[0] == keccak256(bytes(range(136)) + b"tail")
    assert digests[1] == keccak256(b"plonky2 on tpu")


@pytest.mark.slow
def test_all_stark_prove_verify(all_proof_setup):
    all_stark, _, config, proof = all_proof_setup
    verify_all_proof(all_stark, proof, config)


@pytest.mark.slow
def test_all_stark_rejects_mismatched_tables(all_proof_setup):
    """Drop one logic row's flag: the logic grand product no longer matches
    the sponge side, so CTL verification must fail."""
    all_stark, traces, config, _ = all_proof_setup
    bad = [t.copy() for t in traces]
    logic_trace = bad[ast.LOGIC]
    from plonky2_tpu.evm.logic import IS_XOR
    row = int(np.nonzero(logic_trace[IS_XOR])[0][0])
    logic_trace[IS_XOR, row] = 0
    with pytest.raises(Exception):
        proof = prove_all(all_stark, config, bad)
        verify_all_proof(all_stark, proof, config)
