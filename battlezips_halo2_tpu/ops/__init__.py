"""Device (TPU) kernels: NTT, MSM, gate evaluation (SURVEY.md §7.1 items 3-4)."""
