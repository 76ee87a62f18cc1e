"""Single-node numpy oracle: the 'reference outputs' for the P/R gate."""
