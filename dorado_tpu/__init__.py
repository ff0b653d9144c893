"""dorado_tpu — a TPU-native nanopore basecalling engine.

A from-scratch JAX/XLA/Pallas re-imagining of the capabilities of
nanoporetech/dorado (reference: /root/reference): POD5 raw-signal ingestion,
signal normalisation, overlapping chunking, conv+LSTM / transformer CRF
encoders, CRF lattice decoding, chunk stitching and SAM/BAM emission — with
the dense compute expressed as jit-compiled XLA programs and Pallas kernels
sharded over a TPU device mesh.
"""

__version__ = "0.1.0"
