from .manifest import Manifest, partition_plan  # noqa: F401
