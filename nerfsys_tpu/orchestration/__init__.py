"""Orchestration: queue transports, the mediator daemon, config sender."""
