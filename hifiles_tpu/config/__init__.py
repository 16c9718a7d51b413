from .deck import Deck
from .params import RunInput, BCParams

__all__ = ["Deck", "RunInput", "BCParams"]
