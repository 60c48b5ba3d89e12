from .registry import QUERIES, ORACLES, register

__all__ = ["QUERIES", "ORACLES", "register"]
