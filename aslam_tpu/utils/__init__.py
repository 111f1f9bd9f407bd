"""Math & IO utilities (replaces reference Utils/ layer)."""
