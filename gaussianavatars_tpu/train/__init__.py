"""Training layer: jitted step, losses, optimizer with state surgery."""
