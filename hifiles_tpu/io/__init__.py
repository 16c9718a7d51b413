"""Output & observability: restart, ParaView, probes, history, forces."""
