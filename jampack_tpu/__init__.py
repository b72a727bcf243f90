"""jampack-tpu: a TPU-native lossless BWT block codec.

Format-compatible with Jampack v0.80 archives (see SURVEY.md for the
structural analysis of the reference); compute path designed for JAX/XLA/
Pallas with a host C++ runtime for the inherently serial encoder loops.
"""

__version__ = "0.1.0"
