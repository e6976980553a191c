"""EVM recursive aggregation: each table's STARK proof wrapped in a plonky2
circuit, with challenger-state chaining and CTL product checks in the
aggregate (reference evm/src/recursive_verifier.rs)."""
import pytest

from plonky2_tpu.evm import all_stark as ast_mod
from plonky2_tpu.evm.keccak_sponge import KeccakSpongeOp
from plonky2_tpu.evm.prover import prove_all
from plonky2_tpu.evm.recursive_verifier import (PublicInputs,
                                                recursive_stark_circuit,
                                                replay_challenger_states,
                                                verify_recursive_all_proof,
                                                wrap_all_proof,
                                                wrap_table_proof)
from plonky2_tpu.stark.config import StarkConfig


@pytest.fixture(scope="module")
def all_proof_setup():
    all_stark = ast_mod.make_all_stark()
    traces = ast_mod.generate_all_traces(
        [KeccakSpongeOp(0, 2, 0, 1, b"recursive aggregation")])
    config = StarkConfig.standard_fast_config()
    proof = prove_all(all_stark, config, traces)
    return all_stark, config, proof


@pytest.mark.slow
def test_wrap_memory_table_proof(all_proof_setup):
    """Wrap the memory table (smallest; exercises permutation + CTL paths
    in-circuit) and check its decoded public inputs."""
    all_stark, config, proof = all_proof_setup
    table = ast_mod.MEMORY
    ctl_challenges, states = replay_challenger_states(all_stark, proof,
                                                      config)
    wc = recursive_stark_circuit(all_stark.starks[table],
                                 all_stark.cross_table_lookups, table,
                                 proof.degree_bits[table], config)
    wrapped = wrap_table_proof(wc, proof.stark_proofs[table],
                               states[table][0], ctl_challenges)
    wc.data.verify(wrapped)

    pi = PublicInputs.from_vec(wrapped.public_inputs, config)
    assert pi.ctl_challenges == ctl_challenges
    assert pi.challenger_state_before == states[table][0]
    assert pi.challenger_state_after == states[table][1]
    assert pi.ctl_zs_last == [
        int(v) for v in proof.stark_proofs[table].openings.ctl_zs_last]
    cap = proof.stark_proofs[table].trace_cap.digests
    assert pi.trace_cap == [[int(x) for x in h] for h in cap]


@pytest.mark.slow
def test_wrap_rejects_wrong_ctl_challenges(all_proof_setup):
    """Feeding the wrapper different CTL challenges than the transcript's
    breaks the in-circuit CTL constraint check."""
    all_stark, config, proof = all_proof_setup
    table = ast_mod.MEMORY
    ctl_challenges, states = replay_challenger_states(all_stark, proof,
                                                      config)
    wc = recursive_stark_circuit(all_stark.starks[table],
                                 all_stark.cross_table_lookups, table,
                                 proof.degree_bits[table], config)
    bad = type(ctl_challenges)(challenges=[
        type(c)(beta=(c.beta + 1) % 0xFFFFFFFF00000001, gamma=c.gamma)
        for c in ctl_challenges.challenges])
    with pytest.raises(Exception):
        wrapped = wrap_table_proof(wc, proof.stark_proofs[table],
                                   states[table][0], bad)
        wc.data.verify(wrapped)


@pytest.mark.heavy
def test_full_recursive_aggregation(all_proof_setup):
    """Wrap all four tables and verify the aggregate: same CTL challenges,
    chained challenger states, balanced CTL products, valid wrapped
    proofs."""
    all_stark, config, proof = all_proof_setup
    wrapped, circuits = wrap_all_proof(all_stark, proof, config)
    verify_recursive_all_proof(wrapped, circuits,
                               all_stark.cross_table_lookups, config)
