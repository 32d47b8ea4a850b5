from .construction import ConstructionItemParser  # noqa: F401
from .standard import EntityParser  # noqa: F401
