"""nerfsys_tpu — TPU-native adaptive city-scale NeRF framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
psklavos1/NeRF-Sys: spatially clustered mixture-of-experts NeRF with
meta-learned initializations and rapid test-time adaptation, orchestrated by a
Kafka mediator, with occupancy-accelerated volume rendering and a live viewer.

Layering (mirrors SURVEY.md §1, rebuilt TPU-first):
    ops/           pure compute: rays, compositing, encodings, losses, pallas
    models/        NGP / vanilla experts, MoE container, background model
    data/          prepared-dataset ingest, ray stores, episodic task sampler
    pipelines/     offline meta-training, online runtime adaptation, video
    parallel/      mesh construction, sharding specs, collectives
    utils/         config system, checkpointing, logging, metrics
    orchestration/ Kafka mediator and job lifecycle
    viewer/        web viewer engine
"""

__version__ = "0.1.0"
