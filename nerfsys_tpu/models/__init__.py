"""Model families: NGP experts, vanilla NeRF, SIREN, MoE container."""
