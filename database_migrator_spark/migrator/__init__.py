from .core import Migrator
from .ledger import CatalogLedger, Ledger
from .model import Migration, MigrationFile, numeric_or_alpha_key

__all__ = ["Migrator", "Ledger", "CatalogLedger", "Migration", "MigrationFile", "numeric_or_alpha_key"]
