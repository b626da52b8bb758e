"""Interactive web viewer (Viser) with live runtime adaptation.

TPU-native counterpart of /root/reference/adaptive_nerf/viewer/. The render
path is a jitted, shape-bucketed chunk renderer (no recompiles while the user
resizes); training and rendering exchange immutable params pytrees instead of
locking a mutable module, so a render never blocks an optimizer step.
"""
