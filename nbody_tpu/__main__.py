from nbody_tpu.cli import main

main()
