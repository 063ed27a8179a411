"""Block profiler: enter_block/leave_block bracketing (libff parity).

The reference brackets every generator/prover/verifier phase with libff's
enter_block/leave_block (SURVEY.md §5.1).  This is the same surface plus
jax-aware timing (block_until_ready on exit when handed device values) and
an `inhibit_profiling_info` kill switch.

Usage:
    from ethsnarks_tpu.utils.profiling import enter_block, leave_block, block
    enter_block("Call to r1cs_gg_ppzksnark_zok_prover")
    ...
    leave_block("Call to r1cs_gg_ppzksnark_zok_prover")
    # or
    with block("FFT"):
        ...
"""

import time
from contextlib import contextmanager

inhibit_profiling_info = False

_stack = []
_records = []  # (depth, name, seconds)


def start_profiling():
    global _records
    _records = []


def enter_block(name, indent=True):
    if inhibit_profiling_info:
        return
    _stack.append((name, time.perf_counter()))
    print("%s(enter) %s" % ('  ' * (len(_stack) - 1), name))


def leave_block(name, value=None):
    """Close the innermost block (must match); if `value` is a jax value it
    is synced first so timings reflect device completion."""
    if inhibit_profiling_info:
        return
    if value is not None:
        try:
            import jax
            jax.block_until_ready(value)
        except Exception:
            pass
    if not _stack or _stack[-1][0] != name:
        print("(leave) %s [unmatched]" % name)
        return
    _, t0 = _stack.pop()
    dt = time.perf_counter() - t0
    _records.append((len(_stack), name, dt))
    print("%s(leave) %s [%.4fs]" % ('  ' * len(_stack), name, dt))


@contextmanager
def block(name, sync_value=None):
    enter_block(name)
    try:
        yield
    finally:
        leave_block(name, sync_value)


def print_summary():
    if inhibit_profiling_info:
        return
    print("-- profiling summary --")
    for depth, name, dt in _records:
        print("%s%-50s %.4fs" % ('  ' * depth, name, dt))


def print_mem(label=""):
    """Device memory stats (TPU HBM when available)."""
    try:
        import jax
        stats = jax.devices()[0].memory_stats()
        used = stats.get('bytes_in_use', 0)
        limit = stats.get('bytes_limit', 0)
        print("(mem) %s %d MiB used / %d MiB" %
              (label, used >> 20, limit >> 20))
    except Exception:
        pass
