"""Application circuits: passport verification, register/query identity."""
