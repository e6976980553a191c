"""Heavy-tier recorder: run every @pytest.mark.heavy test ONE AT A TIME
and append each outcome to HEAVY_r05.json as it finishes, so a wall-clock
cutoff still leaves a record of everything that completed (VERDICT r3
ask #8 — round 3 recorded only the transfer proof).

Tests run fastest-first (measured/estimated), each under its own
``timeout`` so one hang cannot eat the tier.  Usage:

    python scripts/run_heavy.py [per-test-timeout-seconds]
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "HEAVY_r05.json")

# Fastest-first, by round-3 timings where known.
TESTS = [
    "tests/test_device_witness.py::test_zk_circuit_plan_proof_verifies",
    "tests/test_ecdsa_gadgets.py::test_curve_scalar_mul_short_scalar",
    "tests/test_ecdsa_gadgets.py::test_curve_windowed_mul_short_scalar",
    "tests/test_ecdsa_gadgets.py::test_curve_msm_short_scalars",
    "tests/test_system_zero.py::test_system_zero_prove_verify",
    "tests/test_stark_testing.py::test_circuit_constraints_wide_tables",
    "tests/test_evm_range_check.py::test_noncanonical_limb_forgery_passes_without_range_check",
    "tests/test_evm_range_check.py::test_noncanonical_limb_forgery_rejected_with_range_check",
    "tests/test_evm_range_check.py::test_range_check_full_proof_roundtrip",
    "tests/test_cyclic_recursion.py::test_cyclic_recursion_hash_chain",
    "tests/test_tree_recursion.py::test_tree_recursion",
    "tests/test_evm_recursion.py::test_full_recursive_aggregation",
    "tests/test_ecdsa_verify.py::test_ecdsa_verify_circuit",
    "tests/test_evm_transfer.py::test_transfer_block_proof_verifies",
    "tests/test_evm_heavy_binding.py::test_block_proof_in_kernel_ecrecover_range_check_on",
]


def main() -> None:
    per_test_timeout = int(sys.argv[1]) if len(sys.argv) > 1 else 2400
    results = {"round": 5, "tier": "heavy", "per_test_timeout_s":
               per_test_timeout, "results": []}
    env = dict(os.environ, RUN_HEAVY_TESTS="1")
    for test in TESTS:
        t0 = time.perf_counter()
        proc = subprocess.run(
            ["timeout", str(per_test_timeout), sys.executable, "-m",
             "pytest", test, "-q", "-x", "--no-header", "-p", "no:cacheprovider"],
            cwd=REPO, env=env, capture_output=True, text=True)
        dt = round(time.perf_counter() - t0, 1)
        status = ("passed" if proc.returncode == 0 else
                  "timeout" if proc.returncode == 124 else "failed")
        entry = {"test": test, "status": status, "seconds": dt}
        if status == "failed":
            entry["tail"] = proc.stdout[-400:]
        results["results"].append(entry)
        results["passed"] = sum(r["status"] == "passed"
                                for r in results["results"])
        results["total_attempted"] = len(results["results"])
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(entry), flush=True)


if __name__ == "__main__":
    main()
