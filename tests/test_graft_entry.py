"""Driver-contract tests: __graft_entry__ dryrun_multichip on the virtual
CPU mesh (the driver runs the same check)."""

import sys


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    try:
        import __graft_entry__ as g
    finally:
        sys.path.pop(0)
    g.dryrun_multichip(8)  # asserts finite loss internally
