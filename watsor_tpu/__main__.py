from watsor_tpu.main import main

main()
