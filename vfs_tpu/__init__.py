"""vfs_tpu: a TPU-native video feature-similarity framework.

JAX/XLA/pallas compute path, GSPMD parallelism; capability-parity with
the VFS reference (see SURVEY.md for the component map).
"""

from .version import __version__

__all__ = ['__version__']
