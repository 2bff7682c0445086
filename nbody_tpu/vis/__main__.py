from nbody_tpu.vis.server import main

main()
