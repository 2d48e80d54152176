"""Frontend: SPICE netlist lexer + parser."""
