"""From-scratch vectorized H3 kernel (NumPy): bit math, projections,
traversal, polygon coverage. Implemented from the public H3 spec
(h3geo.org); golden-value parity with the reference test suite
(/root/reference/tests/) is the conformance contract."""
