"""Device-side ops: attention kernels, fbank front end, PSD, merge, CTC.

Everything here is jittable, static-shape, and mask/segment-id disciplined —
the TPU-native replacements for the reference's CUDA/NPU fused kernels and
per-sample host loops (SURVEY.md §2.D).
"""
