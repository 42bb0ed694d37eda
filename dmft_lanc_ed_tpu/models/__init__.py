"""Driver model library (the reference's drivers/ layer as ~50-line configs)."""
