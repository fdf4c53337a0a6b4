"""Driver-contract tests for __graft_entry__.py.

The driver calls ``dryrun_multichip(8)`` in an env whose JAX platform may be
pinned to a single-device TPU plugin; the function must self-provision an
8-device mesh (VERDICT r1 item 1). Reference DP semantics being modeled:
/root/reference/train_stage1.py:68-72,436.
"""

import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_inline():
    # Test env exposes 8 virtual CPU devices -> runs in-process.
    from __graft_entry__ import dryrun_multichip

    assert jax.device_count() >= 8
    dryrun_multichip(8)


def test_dryrun_multichip_self_provisions_when_short_on_devices():
    # Ask for more devices than the current backend has -> must re-exec in a
    # subprocess on a forced CPU mesh instead of asserting (the round-1 bug).
    from __graft_entry__ import dryrun_multichip

    assert jax.device_count() < 16
    dryrun_multichip(16)
