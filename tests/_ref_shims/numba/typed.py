class List(list):
    @classmethod
    def empty_list(cls, *args, **kwargs):
        return cls()
