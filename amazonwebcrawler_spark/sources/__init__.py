"""Sources: seed/dims tables, the deterministic synthetic web world used as
the sandbox 'network', and the snapshot state store for checkpoint/resume."""
