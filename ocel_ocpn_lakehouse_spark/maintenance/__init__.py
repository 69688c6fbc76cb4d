"""The executing maintenance engine (SURVEY §2.9).

The reference *analyzes and simulates* each maintenance action
(ops/maintenance_system.py computes plans but never rewrites); this
package executes them: bin-packing compaction (T2), Z-order clustering
(T6), manifest rewrite (T7), reference-counted snapshot expiry (T3),
copy-on-write MERGE INTO (T12), with checkpoint/lineage-backed idempotent
resume (K3/K4).
"""
