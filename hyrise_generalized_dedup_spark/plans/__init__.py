from .relational import RELATIONAL_ORACLES, RELATIONAL_QUERIES  # noqa: F401
