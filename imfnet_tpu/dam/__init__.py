from imfnet_tpu.dam.dam import descriptor_activation_map, dam_colors  # noqa: F401
