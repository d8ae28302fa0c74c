"""(stub — filled in as the inventory grows)"""
