from .driver_queries import (
    ORACLES,
    QUERIES,
    TRANSCENDENTAL_ALLOWLIST,
    flagship,
)

__all__ = ["ORACLES", "QUERIES", "TRANSCENDENTAL_ALLOWLIST", "flagship"]
