"""Apply the stark_testing harness to every table
(reference per-table tests, e.g. arithmetic_stark degree tests,
keccak_stark.rs test_stark_degree/test_stark_circuit)."""
import pytest

from plonky2_tpu.evm.arithmetic import ArithmeticStark
from plonky2_tpu.evm.keccak_sponge import KeccakSpongeStark
from plonky2_tpu.evm.keccak_stark import KeccakStark
from plonky2_tpu.evm.logic import LogicStark
from plonky2_tpu.evm.memory import MemoryStark
from plonky2_tpu.models.fibonacci_stark import FibonacciStark
from plonky2_tpu.stark.testing import \
    test_stark_circuit_constraints as check_stark_circuit_constraints
from plonky2_tpu.stark.testing import \
    test_stark_low_degree as check_stark_low_degree

STARKS = {
    "fibonacci": FibonacciStark(32),
    "arithmetic": ArithmeticStark(),
    "logic": LogicStark(),
    "memory": MemoryStark(),
    "keccak_sponge": KeccakSpongeStark(),
    "keccak_f": KeccakStark(),
}


@pytest.mark.parametrize("name", list(STARKS))
def test_low_degree(name):
    check_stark_low_degree(STARKS[name])


@pytest.mark.parametrize("name", ["fibonacci", "arithmetic", "logic",
                                  "memory"])
@pytest.mark.slow
def test_circuit_constraints(name):
    check_stark_circuit_constraints(STARKS[name])


@pytest.mark.parametrize("name", ["keccak_sponge", "keccak_f"])
@pytest.mark.heavy
def test_circuit_constraints_wide_tables(name):
    check_stark_circuit_constraints(STARKS[name])
