"""TPU Pallas kernels: byte-plane layouts, decode (plan-execute + fallback
sequence-walk), and compress match finding."""
