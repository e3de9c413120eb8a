"""Per-column physics ops (the reference's mckpp_physics_* layer)."""
