"""
Measured-refutation kernels: real, working, parity-tested code that was
built to test a performance hypothesis and MEASURED SLOWER than the live
path on TPU. Kept out of the production ``ops/`` namespace (VERDICT r4
item 7) so the live surface stays unambiguous; each module links to its
ruling in docs/PERFORMANCE.md. Parity tests remain in
tests/test_pallas_kernels.py and tests/test_s2d_conv.py.
"""
