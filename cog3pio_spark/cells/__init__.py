"""Cell indexing built from scratch in vectorized numpy (no h3/s2 packages
in the sandbox — SURVEY §2.B scalar functions).

* ``s2``  — S2 cell ids per the public S2 geometry spec (cube faces,
            quadratic ST, Hilbert curve, 64-bit ids). Used for global range
            partitioning + prefix range joins (ids are Hilbert-ordered, so
            spatial locality → contiguous id ranges).
* ``h3x`` — H3-style aperture-7 hexagonal hierarchy (res 0..15, parent /
            children / k_ring / compact) used for k-ring kNN expansion and
            multi-resolution rollups.
"""
